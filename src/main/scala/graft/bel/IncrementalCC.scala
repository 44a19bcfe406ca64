package graft.bel

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental connected components — the graph twin of the incremental
  * dedup indexes: a persisted label index `(node, component)` (the output
  * of [[ConnectedComponents.run]]) absorbs a NEW edge batch without
  * recomputing the world. This is what keeps 100 TB graph maintenance
  * (entity resolution, duplicate clusters, citation graphs) from
  * re-running the full O(log n)-round star loop over every edge per
  * snapshot: the star loop re-runs only over the SUPER-GRAPH of
  * components actually touched by new edges.
  *
  * Algorithm (standard union-find-on-summaries):
  *  1. Map each new edge's endpoints through the index: a known node
  *     becomes its component label, an unknown node its own hashed id —
  *     two delta-sized equi-joins (at scale the index is bucketed by
  *     node, making these probes co-located; nothing here ever scans the
  *     prior EDGE set, which is the whole point).
  *  2. The mapped edges form the super-graph over component labels and
  *     new nodes; its components are exactly the merge groups. Run the
  *     alternating-star fixpoint on it — super-graph-sized, O(log)
  *     rounds over |delta| rows, not |graph|.
  *  3. Relabel: prior index rows re-map `component` through the
  *     super-star map (a delta-sized, broadcastable dimension — only
  *     touched components appear); delta-new nodes take their
  *     super-label or themselves. Untouched components pass through
  *     UNCHANGED — and the persisted form ([[writeIndex]]/[[foldIndex]])
  *     makes that physical: the index is partitioned by component
  *     bucket, a fold rewrites ONLY the buckets the delta touches plus
  *     fresh-node buckets, and every other partition's files keep their
  *     exact bytes — append + overwrite-touched, never a rewrite of the
  *     world.
  *
  * Label identity: [[ConnectedComponents.run]] labels a component with
  * the min xxhash64 id over its nodes, and the star fixpoint over merged
  * component labels yields the min over the merged labels — which IS the
  * min over the merged components' nodes. So folding a delta into the
  * index produces BIT-IDENTICAL labels to a from-scratch run over
  * base ∪ delta (the a28 gate pins this against an independent oracle
  * over the full graph), and folds compose: fold(fold(I, d1), d2) =
  * labels(base ∪ d1 ∪ d2).
  */
object IncrementalCC {

  /** Fold `newEdges` (src, dst — same node type as the index's `node`)
    * into `index` (node, component). Returns the updated full index:
    * every prior node plus every delta node, labeled as a from-scratch
    * run over the union graph would label them. */
  def fold(index: DataFrame, newEdges: DataFrame,
           maxIterations: Int = 30): DataFrame = {
    val lab = index.select(col("node"), col("component"))
    val e = newEdges.select(col("src"), col("dst"))
    val (superMap, fresh) = relabelPlan(lab, e, maxIterations)
    // 3a. prior rows: touched components re-map, the rest pass through
    val updated = lab
      .join(superMap.withColumnRenamed("old", "component"),
        Seq("component"), "left")
      .select(col("node"),
        coalesce(col("relabel"), col("component")).as("component"))
    updated.unionByName(fresh)
  }

  /** Steps 1–2 of the fold, shared by the in-memory [[fold]] and the
    * persisted [[foldIndex]]: returns `(superMap(old, relabel),
    * fresh(node, component))` — both delta-sized. */
  private def relabelPlan(lab: DataFrame, e: DataFrame,
                          maxIterations: Int): (DataFrame, DataFrame) = {
    // 1. endpoints → prior labels (or own hash for first-seen nodes)
    val mapped = e
      .join(lab.select(col("node").as("src"), col("component").as("cu")),
        Seq("src"), "left")
      .join(lab.select(col("node").as("dst"), col("component").as("cv")),
        Seq("dst"), "left")
      .select(coalesce(col("cu"), xxhash64(col("src"))).as("u"),
        coalesce(col("cv"), xxhash64(col("dst"))).as("v"))
    // 2. super-graph fixpoint (delta-sized); self-loops — an edge inside
    // one existing component — drop in canonicalize, exactly the
    // "nothing to merge" case
    val stars = ConnectedComponents.starFixpoint(
      ConnectedComponents.canonicalize(mapped), maxIterations)
    val superMap = stars
      .select(col("u").as("old"), col("v").as("relabel"))
      .unionByName(stars.select(col("v").as("old"),
        col("v").as("relabel")))
      .distinct()
    // 3b. first-seen delta nodes: super-label, or themselves (a delta
    // self-loop on a new node yields a singleton — run() parity)
    val fresh = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node")))
      .distinct()
      .join(lab.select("node"), Seq("node"), "left_anti")
      .withColumn("id", xxhash64(col("node")))
      .join(superMap.withColumnRenamed("old", "id"), Seq("id"), "left")
      .select(col("node"),
        coalesce(col("relabel"), col("id")).as("component"))
    (superMap, fresh)
  }

  /** Persist a label index partitioned by COMPONENT bucket
    * (`pmod(component, buckets)`) — the layout [[foldIndex]]'s
    * touched-only overwrite discipline requires: every row of a
    * component lives in one partition directory, so a merge rewrites
    * whole buckets and untouched buckets' files are never opened. */
  def writeIndex(index: DataFrame, path: String, buckets: Int = 64): Unit = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    index.select(col("node"), col("component"),
        pmod(col("component"), lit(buckets.toLong)).as("bucket"))
      .write.partitionBy("bucket").mode(SaveMode.Overwrite).parquet(path)
    // the bucket count IS the layout: persist it so a later fold can
    // never silently misplace rows by assuming a different modulus
    val spark = index.sparkSession
    val p = new org.apache.hadoop.fs.Path(s"$path/$MetaFile")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    try out.write(buckets.toString.getBytes("UTF-8"))
    finally out.close()
  }

  private val MetaFile = "_graft_buckets"

  /** The bucket count a [[writeIndex]] layout was created with, if the
    * marker is present (layouts predating it return None). */
  def readBucketCount(spark: SparkSession, path: String): Option[Int] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/$MetaFile")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val buf = new Array[Byte](32)
        val n = in.read(buf)
        Some(new String(buf, 0, math.max(n, 0), "UTF-8").trim.toInt)
      } finally in.close()
    }
  }

  /** Read a [[writeIndex]]-layout index back as `(node, component)`. */
  def readIndex(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).select("node", "component")

  /** [[foldIndex]]'s rewrite read: an IN-list on the `bucket` PARTITION
    * column, so only the affected directories' files are opened (the
    * PlanShapeSpec pins this lands in `PartitionFilters`, not a data
    * filter). */
  private[graft] def prunedBuckets(spark: SparkSession, path: String,
                                   affected: Seq[Long]): DataFrame =
    spark.read.parquet(path)
      .filter(col("bucket").isin(affected.map(Long.box): _*))
      .select(col("node"), col("component"))

  /** Fold `newEdges` into the PERSISTED index at `path` — the
    * `d_incremental_append` discipline made real for labels: only the
    * component buckets actually touched by the delta are read back,
    * relabeled, and overwritten (dynamic partition overwrite); every
    * other partition's files are untouched bytes. Returns the number of
    * bucket partitions rewritten (0 = the delta merged nothing and
    * introduced no nodes).
    *
    * Why the touched set is CLOSED: a nontrivial relabel u→v makes
    * bucket(u) touched (rows leave it) and bucket(v) touched (rows land
    * in it, and dynamic overwrite replaces whole partitions — so v's
    * existing rows must be in the rewrite set too); a first-seen node's
    * label is either such a `v` or its own hash, whose bucket is added
    * explicitly. Relabels target the min label of the merge group, so
    * no row can land in a bucket outside this set.
    *
    * `buckets` must match the [[writeIndex]] that created the layout.
    * The delta-sized superMap/fresh frames are lineage-cut BEFORE the
    * overwrite (they read `path`); the rewrite itself is cut too, so the
    * write never races its own scan. */
  def foldIndex(spark: SparkSession, path: String, newEdges: DataFrame,
                buckets: Int = 64, maxIterations: Int = 30): Long = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    // fail fast on a modulus mismatch: folding with the wrong bucket
    // count would prune the WRONG partitions and silently corrupt the
    // index (rows rewritten into directories the layout never reads
    // consistently). Layouts predating the marker trust the caller.
    readBucketCount(spark, path).foreach { stored =>
      require(stored == buckets, s"foldIndex: layout at $path was " +
        s"written with buckets=$stored but the fold was asked for " +
        s"buckets=$buckets — the partition modulus is part of the " +
        "layout and cannot change without a rewrite")
    }
    val lab = readIndex(spark, path)
    val e = newEdges.select(col("src"), col("dst"))
    val (superMap0, fresh0) = relabelPlan(lab, e, maxIterations)
    val b = lit(buckets.toLong)
    // identity relabels merge nothing — only real moves touch buckets
    val superMap = graft.core.Checkpoints.cut(
      superMap0.filter(col("old") =!= col("relabel")))
    val fresh = graft.core.Checkpoints.cut(fresh0)
    val affected = superMap.select(pmod(col("old"), b).as("bucket"))
      .unionByName(superMap.select(pmod(col("relabel"), b).as("bucket")))
      .unionByName(fresh.select(pmod(col("component"), b).as("bucket")))
      .distinct().collect().map(_.getLong(0)).sorted
    if (affected.isEmpty) 0L
    else {
      // partition-pruned read: ONLY the affected bucket directories
      val part = prunedBuckets(spark, path, affected.toSeq)
      val rewritten = part
        .join(superMap.withColumnRenamed("old", "component"),
          Seq("component"), "left")
        .select(col("node"),
          coalesce(col("relabel"), col("component")).as("component"))
        .unionByName(fresh)
        .select(col("node"), col("component"),
          pmod(col("component"), b).as("bucket"))
      val out = graft.core.Checkpoints.cut(rewritten)
      // dynamic overwrite scoped to THIS writer (not a session-conf
      // toggle, which a concurrent write on the same session would
      // silently inherit — and whose finally-restore races with it)
      out.write.partitionBy("bucket")
        .option("partitionOverwriteMode", "dynamic")
        .mode(SaveMode.Overwrite)
        .parquet(path)
      // dynamic overwrite only replaces partitions PRESENT in the
      // written data — an affected bucket whose every row migrated to
      // the merged label's bucket writes nothing and would keep its
      // stale files. Drop those emptied partitions explicitly.
      val present = out.select("bucket").distinct()
        .collect().map(_.getLong(0)).toSet
      affected.filterNot(present).foreach { bId =>
        val p = new org.apache.hadoop.fs.Path(s"$path/bucket=$bId")
        p.getFileSystem(spark.sparkContext.hadoopConfiguration)
          .delete(p, true)
      }
      affected.length.toLong
    }
  }
}
