package graft

import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of the dedup pipelines at sf0.1. */
object ProbeDedup {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"STAGE $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val sh = time("shingled.count") {
      val d = graft.ops.Dedup.shingled(docs, 3)
      d.localCheckpoint(true)
    }
    val sig = time("signature.cut") {
      sh.withColumn("sig",
        graft.ops.Dedup.minHashSignature(col("shingles"), 96))
        .localCheckpoint(true)
    }
    val banded = sig.select(col("id"),
      posexplode(org.apache.spark.sql.functions.transform(
        sequence(lit(0), lit(31)),
        b => xxhash64(slice(col("sig"), b.cast("int") * 3 + 1, lit(3)))))
        .as(Seq("band", "bucket")))
    val cands = time("band-join.count") {
      val c = banded.alias("a").join(banded.alias("b"),
        col("a.band") === col("b.band")
          && col("a.bucket") === col("b.bucket")
          && col("a.id") < col("b.id"))
        .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
        .dropDuplicates("id_a", "id_b")
      c.localCheckpoint(true)
    }
    println(s"candidates=${cands.count()}")
    time("verify.count") {
      cands
        .join(sig.select(col("id").as("id_a"), col("shingles").as("sh_a")),
          "id_a")
        .join(sig.select(col("id").as("id_b"), col("shingles").as("sh_b")),
          "id_b")
        .withColumn("n_common",
          size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
        .withColumn("jaccard", col("n_common").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("n_common"))
            .cast("double"))
        .filter(col("jaccard") >= 0.8).count()
    }
    spark.stop()
  }
}
