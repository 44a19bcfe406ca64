package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Plan-capture tool for the optimization rounds: writes the
  * `explain("formatted")` text of selected registered queries to files,
  * so plan-shape claims (Exchange counts, join strategies, PushedFilters)
  * are reviewable without running Spark.
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> [q1,q2,...]
  * Writes <outDir>/<query>_<suffix>.txt per query (all queries when the
  * list is omitted). Queries whose gate runs side effects (stream faces,
  * table lifecycle) still only PLAN here for the final frame — the gate
  * body executes exactly as in Verify, but nothing is collected beyond
  * what the gate itself materializes while constructing the frame.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val only = if (args.length > 3)
      Some(args(3).split(",").map(_.trim).filter(_.nonEmpty).toSet)
    else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]"), cpus.toInt)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        try {
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(FormattedMode)
          Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
            txt.getBytes(StandardCharsets.UTF_8))
          println(s"[plandump] wrote $name")
        } catch {
          case e: Throwable =>
            println(s"[plandump] FAILED $name: ${e.getClass.getSimpleName}")
        }
      }
    spark.stop()
  }
}
