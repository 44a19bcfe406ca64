package graft

import org.apache.spark.sql.functions._

/** CLI smoke tests for the corpus-path overrides: the curation/retrieval
  * commands must run against ANY documents-shaped parquet (--docs), not
  * just the harness table layout — and must NOT stop a pre-existing
  * session (embedding posture). */
class CliSpec extends SparkSpec {
  import spark.implicits._

  private def writeDocs(dir: String): String = {
    val path = s"$dir/corpus.parquet"
    // distinct words per doc (the curation filters drop repetitive text)
    // with enough English stopword markers for the langId heuristic
    (0 until 60).map { i =>
      (i.toLong,
        s"this is sample document number ex$i and it contains several " +
          s"common english words plus a few unique tokens token$i marker$i",
        "en", "unit-test", 120L)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(path)
    path
  }

  test("curate-v2 --docs runs over an arbitrary parquet path") {
    val dir = tmpDir("clidocs")
    val docs = writeDocs(dir)
    val out = s"$dir/curated"
    Cli.main(Array("curate-v2", "--docs", docs, "--out", out))
    val n = spark.read.parquet(out).count()
    assert(n > 0, s"expected curated rows from $docs")
    // the shared test session must survive the CLI run
    assert(!spark.sparkContext.isStopped)
  }

  test("chunk --docs writes chunks for an arbitrary corpus") {
    val dir = tmpDir("clichunk")
    val docs = writeDocs(dir)
    val out = s"$dir/chunks"
    Cli.main(Array("chunk", "--docs", docs, "--out", out,
      "--size", "10", "--overlap", "2"))
    assert(spark.read.parquet(out).count() > 0)
  }

  test("profile --input with explicit columns reads a custom parquet") {
    val dir = tmpDir("cliprof")
    val path = s"$dir/custom.parquet"
    Seq((1L, "a", 1.5), (2L, "a", 2.5), (3L, "b", 9.0))
      .toDF("row_id", "grp", "score").write.parquet(path)
    // prints to stdout; the assertion is that it resolves columns and runs
    Cli.main(Array("profile", "--input", path,
      "--key", "grp", "--id", "row_id", "--value", "score"))
    assert(!spark.sparkContext.isStopped)
  }

  test("semantic-dedup --emb runs the auto path over an arbitrary parquet") {
    val dir = tmpDir("clisem")
    val path = s"$dir/vectors.parquet"
    val out = s"$dir/kept"
    import org.apache.spark.sql.functions._
    (0 until 40).map { i =>
      val a = math.toRadians(if (i % 2 == 0) i * 0.05 else 90.0 + i * 0.05)
      (i.toLong, Seq(math.cos(a).toFloat, math.sin(a).toFloat), i % 2)
    }.toDF("vec_id", "embedding", "label").write.parquet(path)
    Cli.main(Array("semantic-dedup", "--emb", path, "--out", out,
      "--k", "2", "--tau", "0.9999"))
    val kept = spark.read.parquet(out).count()
    assert(kept > 0 && kept < 40, s"expected pruning, kept $kept of 40")
  }
}
