package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Persisted IVF index — the production shape of [[Similarity.ivfTopK]]:
  * build ONCE (cluster the corpus into Voronoi cells, write it
  * PARTITIONED BY CELL plus a centroids side table), then serve many
  * query batches, each of which scans only its probed cells.
  *
  * The 100 TB win over the in-session ivfTopK is in the scan: the probe
  * filter `cell IN (probed...)` is a PARTITION filter on the index
  * layout, so a query batch with nProbe=4 against nList=1024 reads ≤
  * (4·|batch distinct cells|)/1024 of the corpus bytes — file skipping at
  * the source, before any executor sees a row. Centroids are a
  * driver-sized dimension by construction (same contract as the sample
  * they come from).
  */
object IvfIndex {

  /** Cluster and persist the corpus under `path`: `corpus/` partitioned
    * by cell id, `centroids/` as (cell, centroid) rows. */
  def build(corpus: DataFrame, path: String, nList: Int,
            refineIterations: Int = 0,
            idCol: String = "vec_id",
            vecCol: String = "embedding"): Unit = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val (cellIds, cents) =
      if (refineIterations > 0)
        Similarity.refineCentroids(corpus, nList, refineIterations, idCol,
          vecCol)
      else Similarity.sampleCentroids(corpus, nList, idCol, vecCol)
    // normalized column names in the index layout (vec_id, embedding,
    // cell) regardless of the input frame's names — topK reads them back
    // by these names
    corpus
      .select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
      .withColumn("cell",
        element_at(
          Similarity.cellsOfCol(col("embedding"), cellIds, cents, 1), 1))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("cell")
      .parquet(s"$path/corpus")
    cellIds.zip(cents).toDF("cell", "centroid")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/centroids")
  }

  /** Top-k per query against a built index. `nProbe == nList` degrades to
    * exact brute force over the whole index (the oracle mode). */
  def topK(spark: SparkSession, path: String, queries: DataFrame, k: Int,
           nProbe: Int): DataFrame = {
    val centRows = spark.read.parquet(s"$path/centroids").collect()
    val cellIds: Seq[Long] = centRows.map(_.getLong(0)).toSeq
    val cents: Seq[Seq[Double]] = centRows
      .map(_.getSeq[Number](1).map(_.doubleValue()).toSeq).toSeq
    val probes = queries.select(col("query_id"),
      col("embedding").as("qvec"),
      explode(Similarity.cellsOfCol(col("embedding"), cellIds, cents,
        nProbe)).as("cell"))
    // the probed-cell set is ≤ nList values (driver-sized): collected so
    // the IN-list lands in the scan's PartitionFilters and unprobed cells'
    // files are never opened
    val probedCells = probes.select("cell").distinct()
      .collect().map(_.getLong(0)).toSeq
    val indexed = spark.read.parquet(s"$path/corpus")
      .filter(col("cell").isin(probedCells: _*))
    val scored = indexed
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("id"),
        graft.functions.Vectors.cosine(col("qvec"), col("embedding"))
          .as("cosine"))
    Similarity.topKPerQuery(scored, k)
  }
}
