package graft.ops

import graft.SparkSpec

class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
    .toDF("id", "name", "bal")

  test("applySnapshot: highest-seq update wins, delete removes, insert " +
    "adds, untouched keys survive") {
    val changes = Seq(
      (2L, "b2", 21.0, "U", 5L),
      (2L, "b3", 22.0, "u", 7L), // lower-case op accepted; wins by seq
      (3L, "x", 0.0, "D", 4L),
      (4L, "d", 40.0, "I", 2L),
      (5L, "e", 50.0, "I", 3L),
      (5L, "x", 0.0, "D", 9L)) // inserted then deleted: absent
      .toDF("id", "name", "bal", "op", "seq")
    val got = Cdc.applySnapshot(base, changes, Seq("id"))
      .as[(Long, String, Double)].collect().toSet
    assert(got === Set((1L, "a", 10.0), (2L, "b3", 22.0), (4L, "d", 40.0)))
  }

  test("a later re-insert resurrects a deleted key") {
    val changes = Seq(
      (3L, "x", 0.0, "D", 1L), (3L, "c2", 31.0, "I", 2L))
      .toDF("id", "name", "bal", "op", "seq")
    val got = Cdc.applySnapshot(base, changes, Seq("id"))
      .as[(Long, String, Double)].collect().toSet
    assert(got.contains((3L, "c2", 31.0)))
  }

  test("missing changelog columns fail fast") {
    val e = intercept[IllegalArgumentException] {
      Cdc.applySnapshot(base,
        Seq((1L, "z", "U", 1L)).toDF("id", "name", "op", "seq"), Seq("id"))
    }
    assert(e.getMessage.contains("bal"))
  }

  test("seq-threaded tombstone-retaining folds compose under " +
    "INTERLEAVED batch sequences: sequential == union") {
    val rnd = new scala.util.Random(47)
    // b1 carries the odd sequences, b2 the even ones — so the second
    // batch constantly delivers changes OLDER than ones already applied
    // (the partitioned CDC fan-in shape); composition must still hold
    def batch(par: Int) = (0 until 80).map { i =>
      (rnd.nextInt(12).toLong, s"v${2 * i + par}", rnd.nextInt(100).toDouble,
        Seq("I", "U", "D")(rnd.nextInt(3)), 2L * i + par)
    }.toDF("id", "name", "bal", "op", "seq")
    val (b1, b2) = (batch(1), batch(2))
    val seeded = base
      .withColumn("op", org.apache.spark.sql.functions.lit("I"))
      .withColumn("seq", org.apache.spark.sql.functions.lit(0L))
    val chained = Cdc.applySnapshot(
      Cdc.applySnapshot(seeded, b1, Seq("id"), retainTombstones = true),
      b2, Seq("id"), retainTombstones = true)
    val sequential = chained.filter("op != 'D'").drop("op", "seq")
      .as[(Long, String, Double)].collect().toSet
    val union = Cdc.applySnapshot(base, b1.unionByName(b2), Seq("id"))
      .as[(Long, String, Double)].collect().toSet
    assert(sequential === union)
  }

  test("non-positive or null change sequences fail loudly") {
    val bad = Seq((1L, "x", 1.0, "U", 0L)).toDF("id", "name", "bal", "op", "seq")
    val e = intercept[Exception] {
      Cdc.applySnapshot(base, bad, Seq("id")).collect()
    }
    assert(e.getMessage.contains("positive") ||
      Option(e.getCause).exists(_.getMessage.contains("positive")))
  }

  test("snapshotDiff: delta-sized added/removed/changed feed; " +
    "unchanged keys absent; duplicate keys rejected loudly") {
    import org.apache.spark.sql.functions._
    val oldSnap = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("id", "name", "bal")
    val newSnap = Seq((2L, "b", 20.0), (3L, "c", 31.0), (4L, "d", 40.0))
      .toDF("id", "name", "bal")
    val got = Cdc.snapshotDiff(oldSnap, newSnap, Seq("id"),
      Seq("name", "bal")).as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "removed", 3L -> "changed", 4L -> "added"))
    // a change confined to EXCLUDED columns is not a change
    val gotNameOnly = Cdc.snapshotDiff(oldSnap, newSnap, Seq("id"),
      Seq("name")).as[(Long, String)].collect().toMap
    assert(gotNameOnly === Map(1L -> "removed", 4L -> "added"))
    // ambiguous key → loud failure, not a silent arbitrary diff
    val dup = oldSnap.unionByName(
      Seq((1L, "a2", 11.0)).toDF("id", "name", "bal"))
    val e = intercept[Exception] {
      Cdc.snapshotDiff(dup, newSnap, Seq("id"), Seq("name")).collect()
    }
    assert(e.getMessage.contains("duplicate key") ||
      Option(e.getCause).exists(_.getMessage.contains("duplicate key")))
  }
}
