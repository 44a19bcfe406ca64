package graft
import org.apache.spark.sql.SparkSession
object ProbeMinhash {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val t0 = System.nanoTime()
    val n = graft.ops.Dedup.minHashPairs(docs, 3, 0.8).count()
    println(s"PROBE minhash pairs=$n secs=${(System.nanoTime()-t0)/1e9}")
    spark.stop()
  }
}
