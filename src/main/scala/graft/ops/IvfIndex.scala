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

  /** Outcome of an [[append]]: how much landed and how well the frozen
    * centroid set still fits the new data. `staleness` is the drop in
    * mean assigned-centroid cosine vs the build-time baseline (positive =
    * the appended distribution has drifted away from the index's Voronoi
    * partition; rebuild / re-refine when it crosses the caller's budget). */
  final case class AppendStats(appended: Long, meanAssignCosine: Double,
                               baselineMeanCosine: Double) {
    def staleness: Double = baselineMeanCosine - meanAssignCosine
  }

  /** Cluster and persist the corpus under `path`: `corpus/` partitioned
    * by cell id, `centroids/` as (cell, centroid) rows, `stats/` with the
    * build-time fit baseline [[append]] measures drift against. */
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
    // fit baseline: one narrow pass over the just-written layout (the
    // centroid side is a driver-sized broadcast by construction)
    val fit = meanAssignCosine(spark.read.parquet(s"$path/corpus"), spark,
      path)
    Seq((fit._1, fit._2)).toDF("n_rows", "mean_assign_cosine")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(s"$path/stats")
  }

  /** (cell, centroid) rows of the index — driver-sized by contract. */
  private def readCentroids(spark: SparkSession,
                            path: String): (Seq[Long], Seq[Seq[Double]]) = {
    val rows = spark.read.parquet(s"$path/centroids").collect()
    (rows.map(_.getLong(0)).toSeq,
      rows.map(_.getSeq[Number](1).map(_.doubleValue()).toSeq).toSeq)
  }

  /** Mean cosine between each (embedding, cell) row and its cell's
    * centroid: one broadcast join + one aggregate. */
  private def meanAssignCosine(assigned: DataFrame, spark: SparkSession,
                               path: String): (Long, Double) = {
    import spark.implicits._
    val centDf = spark.read.parquet(s"$path/centroids")
      .select(col("cell"), col("centroid"))
    val r = assigned
      .join(broadcast(centDf), Seq("cell"))
      .agg(count(lit(1)),
        avg(graft.functions.Vectors.cosine(col("embedding"),
          col("centroid"))))
      .as[(Long, Option[Double])].head()
    (r._1, r._2.getOrElse(Double.NaN))
  }

  /** Incremental append: assign `newVecs` to the EXISTING centroids (the
    * index's Voronoi partition is frozen between rebuilds) and append
    * into the corpus's cell partitions — existing files are never
    * rewritten, so the append costs one narrow pass over the new rows
    * plus their write. Returns [[AppendStats]]; a growing `staleness`
    * says the frozen centroids no longer fit the incoming distribution
    * and the index wants a rebuild (or a [[Similarity.refineCentroids]]
    * re-refinement). */
  def append(spark: SparkSession, path: String, newVecs: DataFrame,
             idCol: String = "vec_id",
             vecCol: String = "embedding"): AppendStats = {
    import spark.implicits._
    val (cellIds, cents) = readCentroids(spark, path)
    val assigned = newVecs
      .select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
      .withColumn("cell",
        element_at(
          Similarity.cellsOfCol(col("embedding"), cellIds, cents, 1), 1))
    assigned.write.mode(SaveMode.Append)
      .partitionBy("cell")
      .parquet(s"$path/corpus")
    val (n, fit) = meanAssignCosine(assigned, spark, path)
    val baseline = spark.read.parquet(s"$path/stats")
      .select(col("mean_assign_cosine")).as[Double].head()
    AppendStats(n, fit, baseline)
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
