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
    * build-time fit baseline [[append]] measures drift against.
    *
    * `pqM > 0` additionally trains product-quantization codebooks
    * ([[ProductQuantization.train]]) and stores each row's M-byte code
    * array in the layout plus the books under `pq_books/` — the IVFADC
    * composition: [[topKAdc]] then scores probed partitions from the
    * compact `codes` column (M small ints vs 4d vector bytes) and fetches
    * embeddings only for the re-rank survivors. */
  def build(corpus: DataFrame, path: String, nList: Int,
            refineIterations: Int = 0,
            idCol: String = "vec_id",
            vecCol: String = "embedding",
            pqM: Int = 0, pqK: Int = 16): Unit = {
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
    val base = corpus
      .select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
      .withColumn("cell",
        element_at(
          Similarity.cellsOfCol(col("embedding"), cellIds, cents, 1), 1))
    val encoded =
      if (pqM <= 0) base
      else {
        val cb = ProductQuantization.train(corpus, pqM, pqK,
          idCol = idCol, vecCol = vecCol)
        cb.books.zipWithIndex
          .flatMap { case (book, mi) => book.zipWithIndex.map { case (cw, j) =>
            (mi, j, cb.subDim, cw) } }
          .toDF("m", "j", "sub_dim", "codeword")
          .coalesce(1)
          .write.mode(SaveMode.Overwrite).parquet(s"$path/pq_books")
        base.withColumn("codes",
          ProductQuantization.codesCol(col("embedding"), cb))
      }
    encoded
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

  /** PQ codebooks of the index, if it was built with `pqM > 0` —
    * driver-sized by contract (k·d doubles). */
  private def readBooks(
      spark: SparkSession,
      path: String): Option[ProductQuantization.Codebooks] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/pq_books")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val rows = spark.read.parquet(s"$path/pq_books").collect()
      val subDim = rows.head.getInt(2)
      val byM = rows.groupBy(_.getInt(0))
      val books = (0 until byM.keys.max + 1).map { mi =>
        byM(mi).sortBy(_.getInt(1))
          .map(_.getSeq[Number](3).map(_.doubleValue()).toSeq).toSeq
      }
      Some(ProductQuantization.Codebooks(books.length, books.head.length,
        subDim, books))
    }
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
    val base = newVecs
      .select(col(idCol).as("vec_id"), col(vecCol).as("embedding"))
      .withColumn("cell",
        element_at(
          Similarity.cellsOfCol(col("embedding"), cellIds, cents, 1), 1))
    // a PQ-bearing index encodes appended rows with the FROZEN books —
    // appending without codes would surface as null codes in topKAdc
    val assigned = readBooks(spark, path) match {
      case Some(cb) => base.withColumn("codes",
        ProductQuantization.codesCol(col("embedding"), cb))
      case None => base
    }
    assigned.write.mode(SaveMode.Append)
      .partitionBy("cell")
      .parquet(s"$path/corpus")
    val (n, fit) = meanAssignCosine(assigned, spark, path)
    val baseline = spark.read.parquet(s"$path/stats")
      .select(col("mean_assign_cosine")).as[Double].head()
    AppendStats(n, fit, baseline)
  }

  /** Outcome of a [[rebuild]]: corpus size and the whole-layout mean
    * assigned-centroid cosine before (frozen, drifted centroids) and
    * after (freshly refined centroids). A healthy rebuild has
    * `fitAfter > fitBefore`; the new fit also becomes the layout's
    * stored baseline, so subsequent [[append]]s measure drift against
    * the post-rebuild partition. */
  final case class RebuildStats(nRows: Long, fitBefore: Double,
                                fitAfter: Double) {
    def improvement: Double = fitAfter - fitBefore
  }

  /** Whole-layout fit right now: (row count, mean cosine of every stored
    * row to its assigned frozen centroid) — the rebuild trigger metric.
    * One partition-pruning-free narrow scan + broadcast join; compare
    * with the build-time baseline in `stats/` to get total drift. */
  def currentFit(spark: SparkSession, path: String): (Long, Double) =
    meanAssignCosine(spark.read.parquet(s"$path/corpus"), spark, path)

  /** Rebuild the index in place from its CURRENT contents (base build +
    * every appended segment): re-refine `nList` centroids over the full
    * corpus, re-partition every row onto the new Voronoi cells, retrain
    * PQ codebooks when the layout carries them, and refresh the fit
    * baseline — the FAISS "retrain the coarse quantizer when the
    * distribution drifts" maintenance step. The new layout is staged
    * beside the old one and swapped in only after it is fully written,
    * so a failed rebuild leaves the old index intact (the swap itself
    * is not transactional against concurrent readers — run rebuilds in
    * the same maintenance window appends use).
    *
    * Scale shape: identical to [[build]] over the current corpus (the
    * clustering's sample/refine passes + one assignment write), plus
    * one narrow fit pass for the before-metric. Nothing is collected
    * beyond the centroid/codebook dimensions build itself collects. */
  def rebuild(spark: SparkSession, path: String, nList: Int,
              refineIterations: Int = 3): RebuildStats = {
    import spark.implicits._
    val (n, before) = currentFit(spark, path)
    val rows = spark.read.parquet(s"$path/corpus")
      .select(col("vec_id"), col("embedding"))
    val (pqM, pqK) = readBooks(spark, path)
      .map(cb => (cb.m, cb.k)).getOrElse((0, 16))
    val staging = s"${path}__rebuild"
    val conf = spark.sparkContext.hadoopConfiguration
    val stagingP = new org.apache.hadoop.fs.Path(staging)
    val fs = stagingP.getFileSystem(conf)
    if (fs.exists(stagingP)) fs.delete(stagingP, true)
    build(rows, staging, nList, refineIterations, idCol = "vec_id",
      vecCol = "embedding", pqM = pqM, pqK = pqK)
    // swap: staged subdirs replace the live ones
    Seq("corpus", "centroids", "stats", "pq_books").foreach { sub =>
      val live = new org.apache.hadoop.fs.Path(s"$path/$sub")
      val fresh = new org.apache.hadoop.fs.Path(s"$staging/$sub")
      if (fs.exists(live)) fs.delete(live, true)
      if (fs.exists(fresh)) { fs.rename(fresh, live); () }
    }
    fs.delete(stagingP, true)
    val after = spark.read.parquet(s"$path/stats")
      .select(col("mean_assign_cosine")).as[Double].head()
    RebuildStats(n, before, after)
  }

  /** Staleness-driven maintenance: rebuild only when the whole-layout
    * fit has dropped more than `maxDrift` below the stored baseline
    * (accumulated [[append]] drift). Returns None when the index is
    * still healthy — the cheap steady-state answer (one narrow fit
    * pass, no clustering). */
  def rebuildIfStale(spark: SparkSession, path: String, nList: Int,
                     maxDrift: Double,
                     refineIterations: Int = 3): Option[RebuildStats] = {
    import spark.implicits._
    val baseline = spark.read.parquet(s"$path/stats")
      .select(col("mean_assign_cosine")).as[Double].head()
    val (_, fit) = currentFit(spark, path)
    if (baseline - fit > maxDrift) Some(rebuild(spark, path, nList,
      refineIterations))
    else None
  }

  /** IVFADC query (the FAISS-style composition of partition pruning and
    * product quantization): probe cells as a PARTITION filter, score the
    * probed rows from the compact `codes` column against broadcast ADC
    * tables, then fetch embeddings for only the ADC top-`rerankFrom`
    * candidates and re-rank by exact cosine.
    *
    * Scan economics at 100 TB: the heavy pass reads (vec_id, codes) — M
    * small ints per row instead of the 4d-byte embedding (≈32× fewer
    * scan bytes at M=8, d=64 float) — on top of reading only
    * nProbe/nList of the partitions; the embedding column is touched
    * only for the Q·rerankFrom candidate rows of the re-rank join. */
  def topKAdc(spark: SparkSession, path: String, queries: DataFrame, k: Int,
              nProbe: Int, rerankFrom: Int = 32): DataFrame = {
    import spark.implicits._
    val cb = readBooks(spark, path).getOrElse(throw new IllegalStateException(
      s"$path has no pq_books/ — build the index with pqM > 0 for topKAdc"))
    val (cellIds, cents) = readCentroids(spark, path)
    val probes = queries.select(col("query_id"),
      explode(Similarity.cellsOfCol(col("embedding"), cellIds, cents,
        nProbe)).as("cell"))
    val probedCells = probes.select("cell").distinct()
      .collect().map(_.getLong(0)).toSeq
    val qdf = ProductQuantization.distTables(queries, cb)
      .toDF("query_id", "dtab")
    val scored = spark.read.parquet(s"$path/corpus")
      .filter(col("cell").isin(probedCells: _*))
      .select(col("vec_id"), col("cell"), col("codes"))
      .join(broadcast(probes.select(col("query_id"), col("cell"))),
        Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .join(broadcast(qdf), Seq("query_id"))
      .select(col("query_id"), col("vec_id").as("id"),
        (-ProductQuantization.adcScore(col("codes"), col("dtab")))
          .as("cosine"))
    val cand = Similarity.topKPerQuery(scored, rerankFrom)
      .select(col("query_id"), col("id"))
    val qvecs = broadcast(queries.select(col("query_id"),
      col("embedding").as("qvec")))
    val exact = spark.read.parquet(s"$path/corpus")
      .filter(col("cell").isin(probedCells: _*))
      .select(col("vec_id").as("id"), col("embedding"))
      .join(broadcast(cand), Seq("id"))
      .join(qvecs, Seq("query_id"))
      .select(col("query_id"), col("id"),
        graft.functions.Vectors.cosine(col("qvec"), col("embedding"))
          .as("cosine"))
    Similarity.topKPerQuery(exact, k)
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
