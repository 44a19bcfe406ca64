package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

// scratch profiling main — NOT committed
object ProfileScratch {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("a13_graph_stats")
    val sfDir = "/root/testdata/sf0.1"
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = mutable.Map[Int, (Long, String)]()
    val rows = mutable.ArrayBuffer[(Int, Double, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (j.time, j.properties.getProperty("spark.job.description", ""))
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        starts.get(j.jobId).foreach { case (t0, d) =>
          rows += ((j.jobId, (j.time - t0) / 1e3, d.take(80))) }
    })
    val fn = SparkEntry.queries(name)
    fn(spark, sfDir).count() // warm
    sys.env.get("SCRATCH_AQE").foreach(v =>
      spark.conf.set("spark.sql.adaptive.enabled", v))
    Thread.sleep(500)
    rows.clear()
    val t0 = System.nanoTime()
    fn(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"WALL $wall%.2f s, jobs=${rows.size}")
    rows.foreach { case (id, s, d) => println(f"  job $id%3d  $s%6.3f s  $d") }
    println(f"  sum-of-jobs ${rows.map(_._2).sum}%.2f s")
    spark.stop()
  }
}
