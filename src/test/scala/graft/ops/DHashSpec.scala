package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DHashSpec extends SparkSpec {
  import spark.implicits._

  private def p6(w: Int, h: Int, px: Array[Byte]): Array[Byte] =
    s"P6\n$w $h\n255\n".getBytes("US-ASCII") ++ px

  test("hand-computed hash on a 2x2 image") {
    // row 0: white then black (left > right); row 1: black then white.
    // The 9-wide sample grid only compares distinct pixels at x = 4, and
    // rows 0..3 sample image row 0 — so exactly bits 4, 12, 20, 28 set.
    val px = Array[Byte](
      -1, -1, -1, 0, 0, 0, // (255,255,255), (0,0,0)
      0, 0, 0, -1, -1, -1)
    val got = Multimodal.dHashPpm(
      Seq((1L, p6(2, 2, px))).toDF("doc_id", "content"))
      .select("ok", "dhash").collect().head
    assert(got.getBoolean(0))
    assert(got.getLong(1) ===
      ((1L << 4) | (1L << 12) | (1L << 20) | (1L << 28)))
  }

  test("identical blobs hash identically under any partitioning; " +
    "corrupt blobs reject with stable reasons") {
    val blob = p6(3, 2, Array.tabulate(18)(i => (i * 37 % 256).toByte))
    val rows = Seq((1L, blob), (2L, blob),
      (3L, "P5\n1 1\n255\n ".getBytes("US-ASCII")), // wrong magic
      (4L, p6(4, 4, Array[Byte](1, 2, 3)))) // truncated raster
    for (n <- Seq(1, 4)) {
      val out = Multimodal.dHashPpm(rows.toDF("doc_id", "content")
        .repartition(n)).collect()
        .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getLong(2),
          r.getString(3)))).toMap
      assert(out(1L)._1 && out(2L)._1)
      assert(out(1L)._2 === out(2L)._2)
      assert(out(3L) === ((false, 0L, "bad_magic")))
      assert(out(4L) === ((false, 0L, "truncated")))
    }
  }

  test("imageNearDupPairs: exact duplicates pair at hamming 0; " +
    "unrelated synthetic images stay apart") {
    val base = Multimodal.ppmEncode((0L until 40L).toDF("doc_id"))
    val twins = base.select((col("doc_id") + 1000L).as("doc_id"),
      col("content"))
    val pairs = Multimodal.imageNearDupPairs(
      base.unionByName(twins), maxHamming = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // every planted twin recovered at hamming 0
    val planted = pairs.filter(p => p._2 == p._1 + 1000L)
    assert(planted.length === 40 && planted.forall(_._3 === 0))
    // soundness: everything emitted is within the radius
    assert(pairs.forall(_._3 <= 1))
  }
}
