package graft
import org.apache.spark.sql.SparkSession
object ProbeCc {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    // warm
    Queries.queries("a1_count")(spark, d).count()
    for (q <- Seq("a13_graph_stats", "a13_components", "j7_edge_index")) {
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        Queries.queries(q)(spark, d).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[cc] $q min=${times.min}%.2f")
    }
    spark.stop()
  }
}
