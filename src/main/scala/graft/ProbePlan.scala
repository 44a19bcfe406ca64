package graft

/** Dev probe: print the formatted physical plan + wall time for one
  * registered query. Usage: runMain graft.ProbePlan <name> <sfDir> [explain] */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, dir)
    if (args.contains("explain")) df.explain("formatted")
    if (args.contains("simple"))
      // the simple form shows `*(n)` whole-stage-codegen span markers
      println(df.queryExecution.executedPlan.toString)
    val t0 = System.nanoTime()
    val n = df.count()
    println(s"PROBE $name rows=$n secs=${(System.nanoTime() - t0) / 1e9}")
    if (args.contains("final"))
      // post-AQE plan: shows which SortMergeJoins converted to broadcast
      println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
