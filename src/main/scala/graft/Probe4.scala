package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe for the round-4 approximate-op gates: measures the SimHash
  * perturbed-twin Hamming distribution and LSH ANN twin-recall so the
  * registered invariants pin thresholds that actually hold on the driver
  * corpora. */
object Probe4 {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.configure(
      SparkSession.builder().master("local[32]"), 32).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val docs = core.Tables.load(spark, d, "documents")
      // twin = text with one appended token -> one extra shingle
      val base = docs.select(col("doc_id"), col("text"))
      val twin = docs.select(col("doc_id"),
        concat(col("text"), lit(" graftprobe")).as("text"))
      def sh(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
        ops.Dedup.simHash(ops.TextAnalysis.wordShingles(col("text"), 3))
          .as("h"))
      val hamStats = sh(base).withColumnRenamed("h", "h1")
        .join(sh(twin).withColumnRenamed("h", "h2"), "doc_id")
        .select(bit_count(col("h1").bitwiseXOR(col("h2"))).as("ham"))
        .agg(max("ham").as("max"), avg("ham").as("avg"),
          expr("percentile(ham, 0.99)").as("p99")).collect()(0)
      val nDistinct = sh(base).select("h").distinct().count()
      val nDocs = base.count()
      println(s"[probe] $sf simhash twin hamming max=${hamStats.get(0)} " +
        s"avg=${hamStats.get(1)} p99=${hamStats.get(2)} " +
        s"distinct=$nDistinct/$nDocs")
      // LSH twin recall: corpus = base ∪ perturbed twins; queries = 16
      // originals; true top-1 is the twin
      val emb = core.Tables.load(spark, d, "embeddings")
      val basev = emb.select(col("vec_id"),
        functions.Vectors.toDouble(col("embedding")).as("embedding"))
      val twins = basev.select((col("vec_id") + 1000000).as("vec_id"),
        transform(col("embedding"),
          x => x + lit(0.001) * sin(col("vec_id") * 7)).as("embedding"))
      val corpus = basev.unionByName(twins)
      val queriesDf = basev.filter(col("vec_id") < 16)
        .select(col("vec_id").as("query_id"), col("embedding"))
      val brute = ops.Similarity.bruteForceTopK(corpus, queriesDf, k = 1)
        .select("query_id", "id")
      val lsh = ops.Similarity.lshTopK(corpus, queriesDf, k = 1)
        .select("query_id", "id")
      val hit = brute.join(lsh, Seq("query_id", "id"), "left_semi").count()
      val tot = brute.count()
      println(s"[probe] $sf lsh twin-recall@1 = $hit/$tot")
    }
    spark.stop()
  }
}
