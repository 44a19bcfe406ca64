package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two paths, per the scale playbook:
  *  - [[bruteForceTopK]]: exact cosine top-k — the baseline. The query set
  *    is broadcast (queries are small); the corpus streams through one
  *    narrow pass, so cost is |corpus|×|queries| dot products with NO
  *    shuffle of the corpus. Right for ≤ thousands of queries.
  *  - [[lshTopK]]: hyperplane-LSH bucketed ANN — the 100 TB path. Corpus
  *    and queries are bucketed by signature band; dot products only happen
  *    within co-bucketed pairs (equi-join, shuffle on band key). Recall is
  *    tunable via bands × bits.
  */
object Similarity {

  /** Exact top-k neighbors per query vector by cosine similarity.
    * `queries(query_id, embedding)` is broadcast against
    * `corpus(id, embedding)`. Self-pairs (same id) are excluded.
    * Output: (query_id, rank, id, cosine), rank 1..k by (cosine desc, id). */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id",
                     vecCol: String = "embedding"): DataFrame = {
    val scored = corpus.alias("c")
      .join(broadcast(queries.alias("q")),
        col("q.query_id") =!= col(s"c.$idCol"))
      .select(col("q.query_id").as("query_id"),
        col(s"c.$idCol").as("id"),
        Vectors.cosine(col("q.embedding"), col(s"c.$vecCol")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "id", "cosine")
  }

  /** Hyperplane-LSH candidate generation + exact re-rank: `bands` signature
    * bands of `bitsPerBand` sign bits each; a corpus vector is a candidate
    * for a query iff they share at least one band value. Exact cosine
    * re-ranks candidates; top-k of the candidate set is returned.
    * Approximate: recall < 1 by design; raise `bands` for recall, raise
    * `bitsPerBand` for precision (fewer candidates). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
              bands: Int = 8, bitsPerBand: Int = 8,
              idCol: String = "vec_id",
              vecCol: String = "embedding"): DataFrame = {
    def banded(df: DataFrame, id: Column, vec: Column) = {
      // sig is materialized in a first select so the band extraction (which
      // is unrolled statically — shiftright takes a literal shift) does not
      // duplicate the signature expression `bands` times.
      df.select(id.as("bid"), vec.as("bvec"),
          Vectors.hyperplaneSignature(vec, bands * bitsPerBand).as("sig"))
        .select(col("bid"), col("bvec"),
          posexplode(array((0 until bands).map(b =>
            shiftright(col("sig"), b * bitsPerBand)
              .bitwiseAND(lit((1L << bitsPerBand) - 1))): _*))
            .as(Seq("band", "bucket")))
    }
    val cB = banded(corpus, col(idCol), col(vecCol))
      .withColumnRenamed("bid", "id").withColumnRenamed("bvec", "cvec")
    val qB = banded(queries, col("query_id"), col("embedding"))
      .withColumnRenamed("bid", "query_id").withColumnRenamed("bvec", "qvec")
    val cands = cB.join(qB, Seq("band", "bucket"))
      .filter(col("id") =!= col("query_id"))
      .select("query_id", "id", "qvec", "cvec")
      .dropDuplicates("query_id", "id")
    val scored = cands.select(col("query_id"), col("id"),
      Vectors.cosine(col("qvec"), col("cvec")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "id", "cosine")
  }
}
