package graft.bel

import graft.SparkSpec

class IncrementalCCSpec extends SparkSpec {
  import spark.implicits._

  private def labels(df: org.apache.spark.sql.DataFrame) =
    df.as[(String, Long)].collect().toMap

  test("fold merges components across the delta: bridge, extension, " +
    "new component, intra-component no-op") {
    val base = Seq(("a", "b"), ("c", "d"), ("e", "f"), ("g", "h"))
      .toDF("src", "dst")
    val idx = ConnectedComponents.run(base)
    val delta = Seq(
      ("b", "c"), // bridges {a,b} and {c,d}
      ("f", "x"), // extends {e,f} with a new node
      ("y", "z"), // entirely new component
      ("g", "h")) // intra-component duplicate: must change nothing
      .toDF("src", "dst")
    val got = labels(IncrementalCC.fold(idx, delta))
    val want = labels(ConnectedComponents.run(base.unionByName(delta)))
    assert(got === want) // bit-identical labels, not just same partition
    assert(got.keySet === Set("a", "b", "c", "d", "e", "f", "g", "h",
      "x", "y", "z"))
    assert((got("a") === got("d")) && (got("e") === got("x")))
    assert((got("y") === got("z")) && (got("y") !== got("a")))
    assert(got("g") !== got("a"))
  }

  test("randomized folds are bit-identical to from-scratch runs and " +
    "compose across batches") {
    val rnd = new scala.util.Random(31)
    def edge() = (s"n${rnd.nextInt(60)}", s"n${rnd.nextInt(60)}")
    val base = Seq.fill(50)(edge()).toDF("src", "dst")
    val d1 = Seq.fill(25)(edge()).toDF("src", "dst")
    val d2 = Seq.fill(25)(edge()).toDF("src", "dst")
    val afterD1 = IncrementalCC.fold(ConnectedComponents.run(base), d1)
    assert(labels(afterD1) ===
      labels(ConnectedComponents.run(base.unionByName(d1))))
    // composition: folding d2 into the ALREADY-FOLDED index
    val afterD2 = IncrementalCC.fold(afterD1, d2)
    assert(labels(afterD2) === labels(
      ConnectedComponents.run(base.unionByName(d1).unionByName(d2))))
  }

  private def bucketFiles(path: String): Map[String, Map[String, String]] = {
    // bucket dir -> (file name -> md5 of bytes)
    val root = new java.io.File(path)
    root.listFiles().filter(f => f.isDirectory &&
        f.getName.startsWith("bucket=")).map { d =>
      d.getName -> d.listFiles().filter(_.getName.endsWith(".parquet"))
        .map { f =>
          val bytes = java.nio.file.Files.readAllBytes(f.toPath)
          val md = java.security.MessageDigest.getInstance("MD5")
          f.getName -> md.digest(bytes).map("%02x".format(_)).mkString
        }.toMap
    }.toMap
  }

  test("foldIndex: persisted fold equals from-scratch labels; untouched " +
    "bucket partitions keep byte-identical files; folds compose") {
    val dir = java.nio.file.Files.createTempDirectory("ccidx").toFile
    val path = new java.io.File(dir, "idx").getAbsolutePath
    try {
      // components sized to scatter across many buckets
      val base = (0 until 40).map(i => (s"a$i", s"b$i")).toDF("src", "dst")
      IncrementalCC.writeIndex(ConnectedComponents.run(base), path,
        buckets = 16)
      val before = bucketFiles(path)
      // delta merges exactly two components and adds one fresh singleton
      val d1 = Seq(("b3", "a7"), ("q", "q")).toDF("src", "dst")
      val touched = IncrementalCC.foldIndex(spark, path, d1, buckets = 16)
      assert(touched > 0 && touched < 16,
        s"expected a proper subset of buckets rewritten, got $touched")
      val got = labels(IncrementalCC.readIndex(spark, path))
      val want = labels(ConnectedComponents.run(base.unionByName(d1)))
      assert(got === want)
      // untouched partitions: exact same files, exact same bytes
      val after = bucketFiles(path)
      val rewritten = after.keySet.filter(k =>
        before.get(k) != after.get(k)) ++ after.keySet.diff(before.keySet)
      assert(rewritten.size.toLong <= touched)
      val untouched = before.keySet.intersect(after.keySet) -- rewritten
      assert(untouched.nonEmpty, "test graph too small to leave buckets")
      untouched.foreach { k => assert(before(k) === after(k), s"bucket $k") }
      // second fold composes on the persisted index
      val d2 = Seq(("a0", "b3"), ("z1", "z2")).toDF("src", "dst")
      IncrementalCC.foldIndex(spark, path, d2, buckets = 16)
      assert(labels(IncrementalCC.readIndex(spark, path)) === labels(
        ConnectedComponents.run(base.unionByName(d1).unionByName(d2))))
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
  }

  test("foldIndex: randomized fold chain over the persisted index is " +
    "bit-identical to from-scratch at every step") {
    val dir = java.nio.file.Files.createTempDirectory("ccidxr").toFile
    val path = new java.io.File(dir, "idx").getAbsolutePath
    try {
      val rnd = new scala.util.Random(59)
      def edges(n: Int) = Seq.fill(n)(
        (s"n${rnd.nextInt(50)}", s"n${rnd.nextInt(50)}"))
      val base = edges(40).toDF("src", "dst")
      IncrementalCC.writeIndex(ConnectedComponents.run(base), path,
        buckets = 8)
      var union = base
      for (step <- 1 to 3) {
        val delta = edges(15).toDF("src", "dst")
        IncrementalCC.foldIndex(spark, path, delta, buckets = 8)
        union = union.unionByName(delta)
        assert(labels(IncrementalCC.readIndex(spark, path)) ===
          labels(ConnectedComponents.run(union)), s"step $step")
      }
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
  }

  test("foldIndex: a mismatched bucket count fails fast instead of " +
    "silently corrupting the layout") {
    val dir = java.nio.file.Files.createTempDirectory("ccidxm").toFile
    val path = new java.io.File(dir, "idx").getAbsolutePath
    try {
      IncrementalCC.writeIndex(ConnectedComponents.run(
        Seq(("a", "b")).toDF("src", "dst")), path, buckets = 8)
      assert(IncrementalCC.readBucketCount(spark, path) === Some(8))
      val ex = intercept[IllegalArgumentException] {
        IncrementalCC.foldIndex(spark, path,
          Seq(("b", "c")).toDF("src", "dst"), buckets = 16)
      }
      assert(ex.getMessage.contains("buckets=8"))
      // the matching count still folds fine
      IncrementalCC.foldIndex(spark, path,
        Seq(("b", "c")).toDF("src", "dst"), buckets = 8)
      assert(labels(IncrementalCC.readIndex(spark, path)).keySet ===
        Set("a", "b", "c"))
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
  }

  test("foldIndex: an all-duplicate delta rewrites nothing") {
    val dir = java.nio.file.Files.createTempDirectory("ccidx0").toFile
    val path = new java.io.File(dir, "idx").getAbsolutePath
    try {
      val base = Seq(("a", "b"), ("c", "d")).toDF("src", "dst")
      IncrementalCC.writeIndex(ConnectedComponents.run(base), path,
        buckets = 8)
      val before = bucketFiles(path)
      val touched = IncrementalCC.foldIndex(spark, path,
        Seq(("a", "b")).toDF("src", "dst"), buckets = 8)
      assert(touched === 0L)
      assert(bucketFiles(path) === before)
    } finally {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      rm(dir)
    }
  }

  test("a delta self-loop on a first-seen node yields a singleton " +
    "(run() parity)") {
    val idx = ConnectedComponents.run(Seq(("a", "b")).toDF("src", "dst"))
    val got = labels(IncrementalCC.fold(idx,
      Seq(("q", "q")).toDF("src", "dst")))
    assert(got.keySet === Set("a", "b", "q"))
    assert(got("q") !== got("a"))
  }
}
