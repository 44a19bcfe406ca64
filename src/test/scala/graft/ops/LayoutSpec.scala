package graft.ops

import java.io.File

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private def files(dir: String, suffix: String): Seq[File] =
    new File(dir).listFiles().toSeq
      .filter(f => f.getName.endsWith(suffix) && !f.getName.startsWith("_"))

  test("compact: exact file count, content preserved, in-file order") {
    val dir = tmpDir("layout_compact")
    val in = s"$dir/in"
    // 8 small input files, unsorted ids
    (0 until 200).map(i => ((i * 37) % 200L, s"row$i"))
      .toDF("id", "payload").repartition(8).write.parquet(in)
    assert(files(in, ".parquet").size === 8)
    val out = s"$dir/out"
    val back = Layout.compact(spark, in, out, numFiles = 2, Seq("id"))
    assert(files(out, ".parquet").size === 2)
    // content identical as a multiset
    assert(back.as[(Long, String)].collect().sorted.toSeq ===
      spark.read.parquet(in).as[(Long, String)].collect().sorted.toSeq)
    // each physical file is internally sorted by id
    files(out, ".parquet").foreach { f =>
      val ids = spark.read.parquet(f.getPath)
        .select("id").as[Long].collect()
      assert(ids.sameElements(ids.sorted), s"unsorted file ${f.getName}")
    }
  }

  test("compacted layout: a sort-column predicate pushes to the parquet " +
    "reader (min/max row-group pruning input)") {
    val dir = tmpDir("layout_push")
    val in = s"$dir/in"
    (0 until 200).map(i => (i.toLong, s"row$i"))
      .toDF("id", "payload").repartition(4).write.parquet(in)
    val out = s"$dir/out"
    Layout.compact(spark, in, out, numFiles = 2, Seq("id"))
    val read = spark.read.parquet(out).filter(col("id") === 42L)
    read.collect()
    val scan = read.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head.toString
    assert(scan.contains("PushedFilters") && scan.contains("EqualTo(id,42)"),
      s"predicate not pushed to the reader:\n$scan")
  }

  test("mortonCode interleaves bits; known values") {
    val df = Seq((3L, 1L), (1L, 3L), (0L, 0L), (255L, 255L))
      .toDF("a", "b")
    val got = df.select(Layout.mortonCode(col("a"), col("b"), 8))
      .as[Long].collect().toSeq
    // a bits land on even positions, b bits on odd
    assert(got === Seq(7L, 11L, 0L, 65535L))
  }

  test("mortonCode: int inputs with bits > 15 widen to long " +
    "(no mod-32 shift masking, no 32-bit OR overflow)") {
    val df = Seq((65535, 65535), (0, 65535)).toDF("a", "b") // INT columns
    val got = df.select(Layout.mortonCode(col("a"), col("b"), 16))
      .as[Long].collect().toSeq
    // full 16-bit interleave: all 32 low bits set / odd bits only
    assert(got === Seq(4294967295L, 2863311530L))
  }

  test("zorderCompact: content preserved; files carry disjoint, ordered " +
    "z ranges and are internally z-sorted") {
    val dir = tmpDir("layout_z")
    val in = s"$dir/in"
    val rnd = new scala.util.Random(43)
    (0 until 400).map(_ => (rnd.nextInt(200).toLong, rnd.nextInt(200).toLong))
      .toDF("x", "y").repartition(5).write.parquet(in)
    val out = s"$dir/out"
    val back = Layout.zorderCompact(spark, in, out, numFiles = 4, "x", "y")
    assert(back.as[(Long, Long)].collect().sorted.toSeq ===
      spark.read.parquet(in).as[(Long, Long)].collect().sorted.toSeq)
    val ranges = files(out, ".parquet").map { f =>
      val zs = spark.read.parquet(f.getPath)
        .select(Layout.mortonCode(col("x"), col("y"), 8))
        .as[Long].collect()
      assert(zs.sameElements(zs.sorted), s"unsorted file ${f.getName}")
      (zs.min, zs.max)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Seq((_, max1), (min2, _)) => assert(max1 <= min2)
      case _ => ()
    }
  }

  test("mortonCodeN: known 3-column values; n = 2 equals mortonCode") {
    val df = Seq((3L, 1L, 2L), (0L, 0L, 0L), (3L, 3L, 3L))
      .toDF("a", "b", "c")
    val got = df.select(Layout.mortonCodeN(
      Seq(col("a"), col("b"), col("c")), 2)).as[Long].collect().toSeq
    // bit i of column ci lands at 3*i + ci
    assert(got === Seq(43L, 0L, 63L))
    val pairs = Seq((17L, 250L), (255L, 0L), (123L, 45L)).toDF("a", "b")
    val two = pairs.select(Layout.mortonCode(col("a"), col("b"), 8))
      .as[Long].collect().toSeq
    val twoN = pairs.select(Layout.mortonCodeN(Seq(col("a"), col("b")), 8))
      .as[Long].collect().toSeq
    assert(two === twoN)
  }

  test("zorderCompactN: 3-column layout preserves content and gives " +
    "file-level min/max selectivity on EACH clustering column") {
    val dir = tmpDir("layout_z3")
    val in = s"$dir/in"
    val rnd = new scala.util.Random(47)
    (0 until 2000).map(_ => (rnd.nextInt(256).toLong,
        rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
      .toDF("x", "y", "z").repartition(5).write.parquet(in)
    val out = s"$dir/out"
    val back = Layout.zorderCompactN(spark, in, out, numFiles = 8,
      Seq("x", "y", "z"))
    assert(back.as[(Long, Long, Long)].collect().sorted.toSeq ===
      spark.read.parquet(in).as[(Long, Long, Long)].collect().sorted.toSeq)
    val fs = files(out, ".parquet")
    assert(fs.length === 8)
    // per-column file stats: a narrow range predicate on ANY of the
    // three columns must overlap only a strict subset of the files —
    // the property a single-column sort gives one column only
    for (c <- Seq("x", "y", "z")) {
      val overlapping = fs.count { f =>
        val mm = spark.read.parquet(f.getPath)
          .agg(min(col(c)), max(col(c))).as[(Long, Long)].head()
        mm._1 <= 31L && 0L <= mm._2 // overlaps [0, 31]
      }
      assert(overlapping < fs.length,
        s"range [0,31] on $c overlaps ALL ${fs.length} files — no " +
          "per-column clustering")
    }
  }

  test("hilbert curve: exhaustive bijectivity AND the unit-step " +
    "adjacency property for (n=2,b=3) and (n=3,b=2)") {
    for ((n, b) <- Seq((2, 3), (3, 2), (2, 4))) {
      val total = 1L << (n * b)
      var prev: Array[Long] = null
      var code = 0L
      while (code < total) {
        val pt = Layout.hilbertDecode(code, n, b)
        // bijective: encode(decode(c)) == c
        assert(Layout.hilbertScalar(pt.clone(), b) === code,
          s"n=$n b=$b code=$code")
        assert(pt.forall(x => x >= 0 && x < (1L << b)))
        if (prev != null) {
          // THE Hilbert property: consecutive codes are adjacent cells
          val diffs = prev.zip(pt).map { case (a, x) => math.abs(a - x) }
          assert(diffs.sum === 1L,
            s"n=$n b=$b step $code not a unit move: " +
              s"${prev.toSeq} -> ${pt.toSeq}")
        }
        prev = pt
        code += 1
      }
    }
  }

  test("hilbertCodeN column form equals the scalar; hilbertCompactN " +
    "preserves content with per-column file selectivity") {
    val rnd = new scala.util.Random(53)
    val rows = (0 until 1500).map(_ => (rnd.nextInt(256).toLong,
      rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val df = rows.toDF("x", "y", "z")
    val got = df.select(Layout.hilbertCodeN(
      Seq(col("x"), col("y"), col("z")), 8).as("h")).as[Long].collect()
    rows.zip(got).foreach { case ((x, y, z), h) =>
      assert(h === Layout.hilbertScalar(Array(x, y, z), 8))
    }
    val dir = tmpDir("layout_h3")
    val in = s"$dir/in"
    df.repartition(5).write.parquet(in)
    val out = s"$dir/out"
    val back = Layout.hilbertCompactN(spark, in, out, numFiles = 8,
      Seq("x", "y", "z"))
    assert(back.as[(Long, Long, Long)].collect().sorted.toSeq ===
      rows.sorted.toSeq)
    val fs = files(out, ".parquet")
    assert(fs.length === 8)
    for (c <- Seq("x", "y", "z")) {
      val overlapping = fs.count { f =>
        val mm = spark.read.parquet(f.getPath)
          .agg(min(col(c)), max(col(c))).as[(Long, Long)].head()
        mm._1 <= 31L && 0L <= mm._2
      }
      assert(overlapping < fs.length,
        s"range [0,31] on $c overlaps ALL files — no clustering")
    }
  }

  test("hilbertCodeN native expression: masks to low bits inside the " +
    "kernel, null coordinate yields null (agreeing with morton), and " +
    "the plan carries no UDF node") {
    // masking: 300 & 255 = 44 — the column form must equal the scalar
    // over the MASKED coordinates
    val got = Seq((1L, 2L), (300L, 2L)).toDF("x", "y")
      .select(Layout.hilbertCodeN(Seq(col("x"), col("y")), 8).as("h"))
      .as[Long].collect()
    assert(got(0) === Layout.hilbertScalar(Array(1L, 2L), 8))
    assert(got(1) === Layout.hilbertScalar(Array(44L, 2L), 8))
    // sibling-curve null contract: both propagate a null coordinate
    val hm = Seq((Option(1L), Option.empty[Long])).toDF("x", "y")
      .select(Layout.hilbertCodeN(Seq(col("x"), col("y")), 8).as("h"),
        Layout.mortonCode(col("x"), col("y"), 8).as("m"))
      .collect().head
    assert(hm.isNullAt(0), "hilbert must propagate a null coordinate")
    assert(hm.isNullAt(1), "morton must propagate a null coordinate")
    // native expression, not a UDF: nothing fences whole-stage codegen
    val plan = Seq((1L, 2L)).toDF("x", "y")
      .select(Layout.hilbertCodeN(Seq(col("x"), col("y")), 8))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"layout rewrite plan must carry no UDF node:\n$plan")
  }

  test("exportJsonl: gzipped shard files, schema-pinned round-trip") {
    val dir = tmpDir("layout_jsonl")
    val df = (0 until 100).map(i =>
      (i.toLong, s"text with \"quotes\" and\ttabs $i", i % 5))
      .toDF("doc_id", "text", "label")
    val out = s"$dir/shards"
    val back = Layout.exportJsonl(df, out, shards = 3)
    assert(files(out, ".json.gz").size === 3)
    // pinned names+types, not inferred (the reader legitimately widens
    // nullability — a JSON field can always be absent)
    assert(back.schema.fields.map(f => (f.name, f.dataType)).toSeq ===
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq)
    assert(back.as[(Long, String, Int)].collect().sorted.toSeq ===
      df.as[(Long, String, Int)].collect().sorted.toSeq)
  }
}
