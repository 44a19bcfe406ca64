package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every registered query against
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line with per-query seconds.
  * A failed query is reported under "errors" (and excluded from timings) —
  * never as a fast time (a broken query must not look like a fast query).
  *
  * Each query runs SPARK_GRAFT_BENCH_RUNS times (default 3) and reports
  * the MIN: the r2/r3 driver runs recorded contention artifacts (one
  * descheduled run made g2 look 6× slower than it measures on idle
  * hardware), and the r10 driver bench hit the same weather on BOTH of
  * two runs for several keys — min-of-3 makes one descheduled pair
  * unable to poison a key's reported cost.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // warm the JVM/codegen on the FIRST query of the timed (sorted) order,
    // so warm-up is deterministic and the first timed query doesn't pay
    // first-job classloading
    // optional comma-separated allowlist for isolated re-measurement of a
    // few queries while tuning (absent/empty = run everything)
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    val sorted = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    try sorted.headOption.foreach(_._2(spark, sfDir).count())
    catch { case _: Throwable => () }
    val results = sorted.map { case (name, fn) =>
      val timings = (1 to math.max(1, runs)).map { _ =>
        val t0 = System.nanoTime()
        val outcome =
          try { fn(spark, sfDir).count(); None }
          catch { case e: Throwable => Some(e.getClass.getSimpleName) }
        ((System.nanoTime() - t0) / 1e9, outcome)
      }
      // an error in ANY run marks the query failed; min over clean runs
      val err = timings.collectFirst { case (_, Some(e)) => e }
      val best = timings.collect { case (t, None) => t }
        .reduceOption(_ min _).getOrElse(0.0)
      (name, best, err)
    }
    def j(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val ok = results.filter(_._3.isEmpty)
    val qs = ok.map { case (k, v, _) => s"${j(k)}:$v" }.mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) => s"${j(k)}:${j(e)}" }
      .mkString("{", ",", "}")
    val total = ok.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":${j(sfDir)}}""")
    spark.stop()
  }
}
