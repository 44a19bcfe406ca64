package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Pins the SCALE-CRITICAL physical shapes of the training-prep operators
  * — the properties that make them survive a 100× scale-up, which a
  * value-level oracle cannot see: a narrow op silently gaining a shuffle,
  * a broadcast dimension silently becoming a shuffle join, or a per-shard
  * window collapsing to a single global partition would all still return
  * correct rows. AQE is disabled per-test so the executed plan's
  * exchanges are directly collectable (same posture as the bucketed-merge
  * shape test). */
class PlanShapeSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs: DataFrame = {
    val p = s"${tmpDir("ps_docs")}/d"
    (0 until 256).map(i => (i.toLong, s"src${i % 4}",
      s"alpha beta gamma delta $i epsilon zeta"))
      .toDF("doc_id", "source", "text").write.parquet(p)
    spark.read.parquet(p)
  }

  private def executed(df: DataFrame) = {
    df.collect()
    df.queryExecution.executedPlan
  }

  /** A generator child counts as staged when it is a bare column
    * reference — Attribute pre-binding, BoundReference in an executed
    * plan — rather than an inline complex expression. */
  private def staged(
      e: org.apache.spark.sql.catalyst.expressions.Expression): Boolean =
    e.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Attribute] ||
      e.isInstanceOf[org.apache.spark.sql.catalyst.expressions.BoundReference]

  private def withoutAqe[A](body: => A): A = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try body finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("hashSplit and resampleBySource are narrow: zero exchanges") {
    withoutAqe {
      for (df <- Seq(
        TrainingPrep.hashSplit(docs,
          Seq("train" -> 0.9, "test" -> 0.1)).select("doc_id", "split"),
        TrainingPrep.resampleBySource(docs, Map("src0" -> 2.5)))) {
        val plan = executed(df)
        assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
          s"narrow op gained a shuffle:\n$plan")
      }
    }
  }

  test("packSequences shuffles ONCE, on shard — never a global " +
    "single-partition window sort") {
    withoutAqe {
      val plan = executed(TrainingPrep.packSequences(docs, 64, shards = 8))
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size === 1, s"expected one shard shuffle:\n$plan")
      assert(shuffles.head.outputPartitioning.numPartitions > 1,
        s"window collapsed to a single partition:\n$plan")
      assert(shuffles.head.toString.contains("shard"),
        s"shuffle is not on the shard key:\n$plan")
    }
  }

  test("lmScore: vocabulary joins BROADCAST (reference corpus never " +
    "shuffle-joined), scoring aggregates map-side before one doc shuffle") {
    withoutAqe {
      val plan = executed(TrainingPrep.lmScore(docs, docs, vocabSize = 16))
      assert(plan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
        s"vocab join is not broadcast:\n$plan")
      assert(plan.collect { case e: BroadcastExchangeExec => e }.nonEmpty)
      // exchanges: ONLY the doc_id groupBy — the word counts are a
      // materialized (lineage-cut) frame behind the TakeOrdered, so no
      // shuffle join, no global sort for the top-V cut, and no re-scan
      // of the reference corpus appears in the scoring plan
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size === 1, s"unexpected exchange count:\n$plan")
      assert(plan.toString.contains("TakeOrderedAndProject"),
        s"vocab cap is not a TakeOrdered:\n$plan")
    }
  }

  test("simHashPairs: candidate generation is an equi-join on band " +
    "buckets — no cartesian product anywhere") {
    withoutAqe {
      val plan = executed(Dedup.simHashPairs(docs, n = 2, maxHamming = 3))
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
        s"cartesian product in the pair plan:\n$plan")
    }
  }

  test("bm25: term filter precedes the tf shuffle (non-matching words " +
    "never leave the scan), idf joins broadcast, no cartesian") {
    withoutAqe {
      val plan = executed(TextSearch.bm25(docs, Seq("alpha", "zeta")))
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
        s"cartesian product in the bm25 plan:\n$plan")
      assert(plan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
        s"idf join is not broadcast:\n$plan")
      // every shuffle's input already carries the isin term filter below
      // it: the corpus-wide token stream is never exchanged
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.nonEmpty)
      shuffles.foreach { e =>
        assert(e.child.toString.contains("INSET") ||
          e.child.toString.contains("IN ("),
          s"a shuffle input is missing the term filter:\n$e")
      }
    }
  }

  test("duplicateSpans: interval-merge window partitions by doc (never " +
    "a single global partition), dup filter is a semi-join, no cartesian") {
    withoutAqe {
      val plan = executed(Dedup.duplicateSpans(docs, n = 2))
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
        s"cartesian product in the span plan:\n$plan")
      val windowShuffles = plan.collect {
        case e: ShuffleExchangeExec if e.toString.contains("hashpartitioning")
          && e.toString.contains("id") => e
      }
      assert(windowShuffles.forall(_.outputPartitioning.numPartitions > 1),
        s"per-doc window collapsed to one partition:\n$plan")
      assert(plan.toString.contains("LeftSemi"),
        s"dup-gram filter is not a semi-join:\n$plan")
    }
  }

  test("sketchProfile: ONE shuffle on the group key — sketches ride the " +
    "normal partial-aggregation path, no EXPAND, no second exchange") {
    withoutAqe {
      val plan = executed(Profile.sketchProfile(
        docs.select(col("source").as("k"), col("doc_id"),
          col("doc_id").cast("double").as("v")), "k", "doc_id", "v"))
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size === 1,
        s"sketch profile should shuffle once on the key:\n$plan")
      assert(!plan.toString.contains("Expand"),
        s"profile plan contains an EXPAND (exact-distinct shape):\n$plan")
    }
  }

  test("chunk is narrow: zero exchanges, chunks fan out inside the scan " +
    "partitions") {
    withoutAqe {
      val plan = executed(TextAnalysis.chunk(docs, chunkTokens = 4,
        overlap = 1))
      assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"chunking gained a shuffle:\n$plan")
    }
  }

  test("capPerSource: ONE shuffle on the source key via the bounded-heap " +
    "aggregate — no window, no sort of the full input") {
    withoutAqe {
      val plan = executed(TrainingPrep.capPerSource(docs, k = 3,
        score = length(col("text"))))
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size === 1,
        s"per-source cap should shuffle once on source:\n$plan")
      assert(shuffles.head.toString.contains("source"),
        s"shuffle is not on the source key:\n$plan")
      assert(!plan.toString.contains("Window"),
        s"per-source cap fell back to a window rank:\n$plan")
      assert(plan.toString.contains("ObjectHashAggregate"),
        s"bounded-heap aggregate not in the plan:\n$plan")
    }
  }

  test("semanticSurvivors: centroids broadcast, no cartesian verify, no " +
    "window — the cluster self-join is an equi-join") {
    withoutAqe {
      val vecs = (0 until 64).map(i =>
        (i.toLong, Seq(math.cos(i * 0.1), math.sin(i * 0.1))))
        .toDF("vec_id", "embedding")
      val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.0, 1.0)))
        .toDF("cid", "embedding")
      val plan = executed(Dedup.semanticSurvivors(vecs, cents, tau = 0.999))
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
        s"cartesian product in the semantic-dedup plan:\n$plan")
      assert(plan.collect { case b: BroadcastExchangeExec => b }.nonEmpty,
        s"centroid side is not broadcast:\n$plan")
      assert(!plan.toString.contains("Window"),
        s"argmax fell back to a window rank:\n$plan")
    }
  }

  test("asOfJoin: ONE shuffle on the key — no range-join explosion, no " +
    "nested-loop join") {
    withoutAqe {
      val l = (0 until 64).map(i => (i.toLong % 8, i.toLong * 100))
        .toDF("k", "ts")
      val r = (0 until 32).map(i => (i.toLong % 8, i.toLong * 150, i * 1.0))
        .toDF("k", "ts", "payload")
      val plan = executed(
        Temporal.asOfJoin(l, r, Seq("k"), tolerance = Some(500L)))
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty &&
        !plan.toString.contains("BroadcastNestedLoop"),
        s"as-of join planned a product:\n$plan")
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size === 1,
        s"as-of join should shuffle once on the key:\n$plan")
    }
  }

  test("incrementalSurvivors: ONE anti-join on the fingerprint; a " +
    "dimension-sized index broadcasts") {
    withoutAqe {
      val dir = s"${tmpDir("ps_fpidx")}/idx"
      Dedup.writeFingerprintIndex(docs.limit(64), dir)
      val plan = executed(
        Dedup.incrementalSurvivors(spark, dir, docs))
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
        s"cartesian in the incremental probe:\n$plan")
      assert(plan.toString.contains("LeftAnti"),
        s"expected an anti-join against the index:\n$plan")
      assert(plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
        s"small index should broadcast, not shuffle:\n$plan")
    }
  }

  test("incrementalNearDups: banded candidates are an equi-join — no " +
    "cartesian, index never self-joined") {
    withoutAqe {
      val dir = s"${tmpDir("ps_mhidx")}/idx"
      Dedup.writeMinHashIndex(docs.limit(64), dir)
      val plan = executed(
        Dedup.incrementalNearDups(spark, dir, docs, threshold = 0.5))
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
        s"cartesian in the near-dup probe:\n$plan")
      assert(!plan.toString.contains("NestedLoop"),
        s"nested-loop join in the near-dup probe:\n$plan")
    }
  }

  test("stream-static enrich (batch face): dimension broadcasts, stream " +
    "side never shuffles") {
    withoutAqe {
      val dim = (0 until 4).map(i => (i.toLong, s"seg$i")).toDF("k", "seg")
      val plan = executed(graft.streaming.EventStreams.enrich(
        docs.withColumn("user", col("doc_id") % 4), dim, "user", "k"))
      assert(plan.collect { case b: BroadcastHashJoinExec => b }.nonEmpty,
        s"dimension did not broadcast:\n$plan")
      assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"stream side shuffled for a broadcast join:\n$plan")
    }
  }

  test("saltedJoin without broadcast: shuffle join on (key, salt), no " +
    "product, replicate side stays narrow pre-shuffle") {
    withoutAqe {
      val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      try {
        val left = docs.select(col("doc_id"), (col("doc_id") % 4).as("k"))
        val right = (0 until 4).map(i => (i.toLong, s"p$i")).toDF("k", "p")
        val plan = executed(
          graft.core.Skew.saltedJoin(left, right, "k", "doc_id", 8))
        assert(plan.collect { case c: CartesianProductExec => c }.isEmpty &&
          !plan.toString.contains("NestedLoop"),
          s"salted join planned a product:\n$plan")
        val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
        assert(shuffles.size === 2,
          s"expected one exchange per side on (key, salt):\n$plan")
      } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("asOfJoinNearest: both direction passes share ONE shuffle on the " +
    "key — still no join operator") {
    withoutAqe {
      val l = (0 until 64).map(i => (i.toLong % 8, i.toLong * 100))
        .toDF("k", "ts")
      val r = (0 until 32).map(i => (i.toLong % 8, i.toLong * 150, i * 1.0))
        .toDF("k", "ts", "payload")
      val plan = executed(
        Temporal.asOfJoinNearest(l, r, Seq("k"), tolerance = Some(500L)))
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty &&
        !plan.toString.contains("BroadcastNestedLoop") &&
        !plan.toString.contains("SortMergeJoin"),
        s"nearest as-of planned a join:\n$plan")
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size === 1,
        s"the two window passes should share one key shuffle:\n$plan")
    }
  }

  test("scd2 and rollingSum: ONE shuffle on the key; window passes " +
    "reuse the partitioning") {
    withoutAqe {
      val ev = (0 until 128).map(i =>
        (i.toLong % 8, i.toLong * 7, s"s${i % 3}", (i % 11).toLong))
        .toDF("k", "ts", "state", "v")
      for (df <- Seq(
        Temporal.scd2(ev, Seq("k"), "ts", "state"),
        Temporal.rollingSum(ev, Seq("k"), "ts", "v", 50L))) {
        val plan = executed(df)
        val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
        assert(shuffles.size === 1,
          s"expected one key shuffle:\n$plan")
      }
    }
  }

  test("funnel perUserReach: ONE shuffle on the user key; the stage " +
    "filter reaches the scan side") {
    withoutAqe {
      val ev = (0 until 256).map(i =>
        (i.toLong % 16, i.toLong * 3, if (i % 4 == 0) "view"
        else if (i % 4 == 1) "click" else "noise"))
        .toDF("user_id", "ts", "event_type")
      val plan = executed(
        Funnel.perUserReach(ev, Seq("view", "click"), tsCol = "ts"))
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size === 1,
        s"funnel should be one groupBy shuffle:\n$plan")
      assert(!plan.toString.contains("Window"),
        s"the fold must not be a window funnel:\n$plan")
    }
  }

  test("funnel transitionLags: the per-transition struct array is STAGED " +
    "in its own projection before the explode (generator child is a bare " +
    "attribute, the measured codegen-staging rule)") {
    withoutAqe {
      val ev = (0 until 256).map(i =>
        (i.toLong % 16, new java.sql.Timestamp(i.toLong * 60000),
          if (i % 4 == 0) "view" else if (i % 4 == 1) "click" else "buy"))
        .toDF("user_id", "ts", "event_type")
      val plan = executed(
        Funnel.transitionLags(ev, Seq("view", "click", "buy")))
      val gens = plan.collect {
        case g: org.apache.spark.sql.execution.GenerateExec => g }
      assert(gens.nonEmpty, s"no generate node found:\n$plan")
      gens.foreach { g =>
        assert(g.boundGenerator.children.forall(staged),
          s"explode child is a complex inline expression, not a staged " +
            s"attribute:\n$plan")
      }
    }
  }

  test("resampleFfill: no join operator anywhere (grid + as-of are " +
    "union/window plans), grid explode staged, windows multi-partition") {
    withoutAqe {
      val obs = (0 until 256).map(i =>
        (i.toLong % 16, i.toLong * 1000L, i.toDouble))
        .toDF("k", "ts", "v")
      val plan = executed(
        Temporal.resampleFfill(obs, Seq("k"), "ts", stepUs = 4000L))
      assert(plan.collect {
        case c: CartesianProductExec => c
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
        case j: BroadcastHashJoinExec => j
        case j: org.apache.spark.sql.execution.joins
          .BroadcastNestedLoopJoinExec => j
      }.isEmpty, s"resampleFfill must not plan a join:\n$plan")
      val gens = plan.collect {
        case g: org.apache.spark.sql.execution.GenerateExec => g }
      assert(gens.nonEmpty)
      gens.foreach(g => assert(g.boundGenerator.children.forall(staged),
        s"grid sequence not staged before explode:\n$plan"))
      plan.collect { case e: ShuffleExchangeExec => e }.foreach(e =>
        assert(e.outputPartitioning.numPartitions > 1,
          s"a window collapsed to one partition:\n$plan"))
    }
  }

  test("asOfJoinBroadcast: the EVENT side never shuffles — every " +
    "exchange sits under the broadcast subtree, no window, no " +
    "sort-merge join") {
    withoutAqe {
      val left = docs.select(col("doc_id").as("k"),
        (col("doc_id") * 7).as("ts"), col("source"))
      val right = (0 until 32).map(i => (i.toLong, i.toLong * 50, i * 1.0))
        .toDF("k", "ts", "q")
      val plan = executed(
        Temporal.asOfJoinBroadcast(left, right, Seq("k")))
      assert(plan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
        s"broadcast as-of must plan a broadcast join:\n$plan")
      assert(!plan.toString.contains("SortMergeJoin") &&
        !plan.toString.contains("Window"),
        s"unexpected shuffle-side operator:\n$plan")
      val bcast = plan.collect { case b: BroadcastExchangeExec => b }
      val outside = plan.collect { case e: ShuffleExchangeExec => e }
        .filterNot(e => bcast.exists(b =>
          b.collect { case x if x eq e => x }.nonEmpty))
      assert(outside.isEmpty,
        s"the event side gained a shuffle of its own:\n$plan")
    }
  }

  test("CDC apply: ONE shuffle on the key via the orderable-struct max " +
    "— no window, no join") {
    withoutAqe {
      val base = docs.select(col("doc_id").as("id"), col("text"))
      val changes = docs.select((col("doc_id") % 64).as("id"), col("text"),
        lit("U").as("op"), (col("doc_id") + 1).as("seq"))
      val plan = executed(Cdc.applySnapshot(base, changes, Seq("id")))
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size === 1,
        s"CDC apply should shuffle once on the key:\n$plan")
      assert(!plan.toString.contains("Window") &&
        !plan.toString.contains("Join"),
        s"winner selection must be the struct-max aggregate:\n$plan")
    }
  }

  test("incremental CC fold: no cartesian product; the super-star map " +
    "joins back into the index as a BROADCAST dimension") {
    withoutAqe {
      val base = (0 until 64).map(i => (s"a$i", s"b${i % 8}"))
        .toDF("src", "dst")
      val idx = graft.bel.ConnectedComponents.run(base)
      val delta = (0 until 8).map(i => (s"b$i", s"b${(i + 1) % 8}"))
        .toDF("src", "dst")
      val plan = executed(graft.bel.IncrementalCC.fold(idx, delta))
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
        s"fold planned a cartesian product:\n$plan")
      assert(plan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
        s"relabel join should broadcast the delta-sized super map:\n$plan")
    }
  }

  test("cosinePairs: candidates meet by EQUI-join on the term — no " +
    "cartesian, no nested loop") {
    withoutAqe {
      val plan = executed(
        TextSearch.cosinePairs(docs, num = 1, den = 2, dfCap = 100,
          ngram = 2, materialize = false))
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty &&
        !plan.toString.contains("BroadcastNestedLoop"),
        s"cosine pair generation planned a product:\n$plan")
    }
  }

  test("partitionBy layout: a partition-column predicate becomes a " +
    "PartitionFilter at the scan — pruned directories, no data filter") {
    withoutAqe {
      val p = s"${tmpDir("ps_layout")}/docs"
      docs.write.partitionBy("source").parquet(p)
      val read = spark.read.parquet(p).filter(col("source") === "src1")
        .select("doc_id", "text")
      val scan = executed(read).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scan.nonEmpty, "expected a file scan")
      val s = scan.head.toString
      assert(s.contains("PartitionFilters") && s.contains("src1"),
        s"partition predicate did not reach the scan:\n$s")
      // the predicate must NOT degrade to a post-scan data filter
      assert(s.contains("DataFilters: []"),
        s"partition column leaked into data filters:\n$s")
    }
  }

  test("negative sampling: bucket equi-join only — no cartesian over " +
    "triples x entities, no nested loop") {
    withoutAqe {
      val triples = (1 to 64).map(i => (i.toLong % 8, "r", i.toLong % 16))
        .distinct.toDF("s", "r", "o")
      val entities = (0L to 63L).toDF("e")
      val plan = executed(graft.bel.NegativeSampling.corruptObjects(
        triples, entities, k = 2, buckets = 4))
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty &&
        !plan.toString.contains("BroadcastNestedLoop"),
        s"negative sampling planned a product:\n$plan")
      assert(plan.toString.contains("LeftAnti"),
        s"expected the true-triple anti-join:\n$plan")
    }
  }

  test("skipGramPairs: walk-scoped equi-join, band filter rides the " +
    "join stage — no cartesian") {
    withoutAqe {
      val rows = (0 until 128).map(i => (i.toLong % 16, i % 5, i.toLong))
        .toDF("walk_id", "pos", "node")
      val plan = executed(graft.bel.RandomWalks.skipGramPairs(rows, 2))
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty &&
        !plan.toString.contains("BroadcastNestedLoop"),
        s"skip-gram pairing planned a product:\n$plan")
    }
  }

  test("foldIndex rewrite read: the affected-bucket IN-list is a " +
    "PartitionFilter at the scan — untouched buckets' files never open") {
    withoutAqe {
      import spark.implicits._
      val path = s"${tmpDir("ps_ccidx")}/idx"
      graft.bel.IncrementalCC.writeIndex(
        graft.bel.ConnectedComponents.run(
          (0 until 32).map(i => (s"a$i", s"b$i")).toDF("src", "dst")),
        path, buckets = 8)
      val read = graft.bel.IncrementalCC.prunedBuckets(spark, path,
        Seq(1L, 3L))
      val scan = executed(read).collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scan.nonEmpty, "expected a file scan")
      val s = scan.head.toString
      assert(s.contains("PartitionFilters") && s.contains("bucket"),
        s"bucket IN-list did not reach PartitionFilters:\n$s")
      assert(s.contains("DataFilters: []"),
        s"bucket column leaked into data filters:\n$s")
    }
  }

  test("standardize: the normalized output is NARROW — stats ride a " +
    "collected literal, zero exchanges, no join in the emitted frame") {
    withoutAqe {
      import spark.implicits._
      val vecs = (0 until 50).map(i =>
        (i.toLong, Array.tabulate(6)(j => (i * 7 + j).toFloat)))
        .toDF("vec_id", "embedding")
      val plan = executed(Similarity.standardize(vecs))
      assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"standardize output gained an exchange:\n$plan")
      assert(!plan.toString.contains("Join"),
        s"standardize output must not join the stats:\n$plan")
    }
  }

  test("personalized PageRank: the seed-restart scaffold adds NO " +
    "exchange over the uniform power loop") {
    withoutAqe {
      import spark.implicits._
      val edges = Seq("a" -> "b", "b" -> "c", "c" -> "a", "c" -> "d")
        .toDF("src", "dst")
      val seeds = Seq(("a", 2.0), ("c", 1.0)).toDF("node", "weight")
      def exchanges(df: DataFrame) =
        executed(df).collect { case e: ShuffleExchangeExec => e }.length
      val uni = exchanges(graft.bel.PageRank.run(edges, iterations = 3))
      val ppr = exchanges(graft.bel.PageRank.runPersonalized(edges, seeds,
        iterations = 3))
      assert(ppr === uni,
        s"personalized loop changed the exchange count: $ppr vs $uni")
    }
  }

  test("dedupLines: equi-join back on the line key — no cartesian, no " +
    "window, every exchange stays multi-partition") {
    withoutAqe {
      val plan = executed(Dedup.dedupLines(
        docs.select(col("doc_id"),
          concat_ws("\n", col("text"), col("source")).as("text"))))
      assert(plan.collect { case c: CartesianProductExec => c }.isEmpty,
        s"cartesian product in the line-dedup plan:\n$plan")
      assert(!plan.toString.contains("Window"),
        s"line dedup must not use a window:\n$plan")
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.nonEmpty &&
        shuffles.forall(_.outputPartitioning.numPartitions > 1),
        s"an exchange collapsed to a single partition:\n$plan")
    }
  }

  test("urlDomainWithSuffixes: the suffix list BROADCASTS (never a " +
    "shuffle join against the candidate fan-out) and every shuffle " +
    "keys on host") {
    withoutAqe {
      val hosts = docs.select(concat(lit("h"), col("doc_id") % 40,
        lit(".example.co.uk")).as("host"))
      val suffixes = Seq("uk", "co.uk", "com").toDF("suffix")
      val plan = executed(
        TextAnalysis.urlDomainWithSuffixes(hosts, suffixes))
      assert(plan.collect { case j: BroadcastHashJoinExec => j }.nonEmpty,
        s"suffix match must plan a broadcast join:\n$plan")
      val bcast = plan.collect { case b: BroadcastExchangeExec => b }
      val outside = plan.collect { case e: ShuffleExchangeExec => e }
        .filterNot(e => bcast.exists(b =>
          b.collect { case x if x eq e => x }.nonEmpty))
      // the non-broadcast exchanges are the host-keyed distinct and the
      // longest-match fold — both hash on host, nothing else
      assert(outside.nonEmpty)
      outside.foreach(e => assert(e.toString.contains("host"),
        s"an exchange is not keyed on host:\n$plan"))
    }
  }

  test("Pca.gramExact: pair join is an EQUI-join on the row key (no " +
    "cartesian), partial aggregation below the cell exchange, all " +
    "codegen'd (no interpreted HOF in the product path)") {
    withoutAqe {
      val vecs = docs.select(col("doc_id").as("vec_id"),
        array((0 to 3).map(i => (col("doc_id") % (i + 7)).cast("double")
          * 0.1): _*).as("embedding"))
      val plan = executed(Pca.gramExact(vecs))
      assert(plan.collect { case j: CartesianProductExec => j }.isEmpty &&
        plan.collect {
          case j: org.apache.spark.sql.execution.joins
            .BroadcastNestedLoopJoinExec => j }.isEmpty,
        s"pairing must be an equi-join:\n$plan")
      // map-side combine: a partial aggregate below the final exchange,
      // so the cell shuffle carries cells × partitions, not rows
      val partial = plan.collect {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec
          if a.aggregateExpressions.exists(_.mode ==
            org.apache.spark.sql.catalyst.expressions.aggregate.Partial) => a
      }
      assert(partial.nonEmpty, s"no partial aggregate:\n$plan")
      // the product path must stay codegen'd: no HigherOrderFunction
      // survives in the executed plan's projections
      val hofs = plan.expressions.flatMap(_.collect {
        case h: org.apache.spark.sql.catalyst.expressions
          .HigherOrderFunction => h
      })
      assert(hofs.isEmpty, s"interpreted HOF in the hot path:\n$plan")
    }
  }

  test("Anomaly.flagOutliers: ONE shuffle keyed on the entity, ONE " +
    "window pass for all three frame aggregates") {
    withoutAqe {
      val ev = docs.select(col("doc_id").as("event_id"),
        (col("doc_id") % 16).as("user_id"),
        to_timestamp(lit("2026-01-01 00:00:00")).as("ts"),
        (col("doc_id") % 97).cast("double").as("value"))
      val plan = executed(Anomaly.flagOutliers(ev))
      val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
      assert(shuffles.size == 1 &&
        shuffles.head.toString.contains("user_id"),
        s"expected one user-keyed exchange:\n$plan")
      val windows = plan.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w }
      assert(windows.size == 1,
        s"cnt/s/ss must share one WindowExec:\n$plan")
    }
  }

  test("prioritySample: global top-k plans as TakeOrderedAndProject — " +
    "per-partition heaps, no full sort, no exchange") {
    withoutAqe {
      val plan = executed(TrainingPrep.prioritySample(
        docs, k = 10, weight = length(col("text")).cast("long")))
      assert(plan.collect {
        case t: org.apache.spark.sql.execution.TakeOrderedAndProjectExec => t
      }.nonEmpty, s"expected TakeOrderedAndProject:\n$plan")
      assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty &&
        plan.collect { case s: org.apache.spark.sql.execution.SortExec => s }
          .isEmpty,
        s"global sample must not sort or shuffle the corpus:\n$plan")
    }
  }

  test("Pca projection/whitening is NARROW: broadcast-literal matrix, " +
    "zero exchanges") {
    withoutAqe {
      val vecs = docs.select(col("doc_id").as("vec_id"),
        array((0 to 2).map(i => (col("doc_id") % (i + 5)).cast("double"))
          : _*).as("embedding"))
      val model = Pca.fit(vecs)
      val plan = executed(Pca.whiten(vecs, model, k = 2))
      assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        s"projection gained a shuffle:\n$plan")
    }
  }

  test("CUBE / GROUPING SETS: all levels in ONE Expand and ONE " +
    "data-sized shuffle — never a scan per grouping set") {
    withoutAqe {
      docs.select(col("source"), (col("doc_id") % 3).as("bucket"),
          col("doc_id"))
        .createOrReplaceTempView("ps_cube_in")
      for (sql <- Seq(
        """SELECT source, bucket, count(*) AS n FROM ps_cube_in
           GROUP BY CUBE (source, bucket)""",
        """SELECT source, bucket, count(*) AS n FROM ps_cube_in
           GROUP BY GROUPING SETS ((source), (bucket), ())""")) {
        val plan = executed(spark.sql(sql))
        val expands = plan.collect {
          case e: org.apache.spark.sql.execution.ExpandExec => e }
        assert(expands.size == 1, s"expected ONE Expand:\n$plan")
        val shuffles = plan.collect { case e: ShuffleExchangeExec => e }
        assert(shuffles.size == 1,
          s"expected ONE data-sized shuffle:\n$plan")
      }
    }
  }
}
