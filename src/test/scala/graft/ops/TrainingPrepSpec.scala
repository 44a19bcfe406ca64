package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TrainingPrepSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit: deterministic, label set respected, proportions sane") {
    val ids = (0L until 2000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = TrainingPrep.hashSplit(ids, splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = TrainingPrep.hashSplit(ids, splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a === b) // reproducible: same ids, same labels, any run
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    val frac = a.values.count(_ == "train").toDouble / a.size
    assert(frac > 0.75 && frac < 0.85, s"train fraction $frac")
    // weights must sum to 1
    intercept[IllegalArgumentException](
      TrainingPrep.hashSplit(ids, Seq("a" -> 0.5)))
  }

  test("resampleBySource: integer copies + deterministic fractional part, " +
    "zero weight drops the source") {
    val docs = (0L until 400L).map(i => (i, s"src${i % 4}", "t"))
      .toDF("doc_id", "source", "text")
    val weights = Map("src0" -> 2.0, "src1" -> 0.5, "src2" -> 0.0)
    val got = TrainingPrep.resampleBySource(docs, weights)
      .as[(Long, String, Int)].collect()
    val bySource = got.groupBy(_._2).view.mapValues(_.length).toMap
    assert(bySource("src0") === 200)            // exactly 2 copies each
    assert(!bySource.contains("src2"))          // dropped
    assert(bySource("src3") === 100)            // default weight 1.0
    val frac = bySource("src1").toDouble / 100  // ~half survive
    assert(frac > 0.3 && frac < 0.7, s"src1 kept fraction $frac")
    // reproducible: identical multiset on re-run
    val again = TrainingPrep.resampleBySource(docs, weights)
      .as[(Long, String, Int)].collect()
    assert(got.sorted.toSeq === again.sorted.toSeq)
    // copy indices are 1..n per doc
    assert(got.filter(_._2 == "src0").groupBy(_._1)
      .forall(_._2.map(_._3).sorted.toSeq == Seq(1, 2)))
  }

  test("resample and split draws are independent: a 0.5-downsampled " +
    "source still yields val and test members among its survivors") {
    // with a SHARED unsalted draw, resample(w=0.5) keeps exactly u < 0.5
    // and split(train = u < 0.8) then labels every survivor 'train' —
    // val/test would receive ZERO docs from any downsampled source
    val docs = (0L until 2000L).map(i => (i, "srcA", "t"))
      .toDF("doc_id", "source", "text")
    val survivors = TrainingPrep.resampleBySource(docs, Map("srcA" -> 0.5))
      .select("doc_id")
    val labels = TrainingPrep.hashSplit(
      docs.join(survivors, "doc_id"),
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(labels.keySet === Set("train", "val", "test"),
      s"downsampled source starved a split: $labels")
    val n = labels.values.sum.toDouble
    assert(labels("train") / n > 0.7 && labels("train") / n < 0.9)
  }

  test("lmScore: golden unigram scores incl. the OOV floor") {
    val docs = Seq((1L, "a a b"), (2L, "c")).toDF("doc_id", "text")
    // reference counts: a=2, b=1, c=1, total=4
    val full = TrainingPrep.lmScore(docs, docs, vocabSize = 10)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    def r4(x: Double) = math.rint(x * 1e4) / 1e4
    val (la, lb) = (math.log(2.0 / 4), math.log(1.0 / 4))
    assert(full(1L) === ((1L, 3L, r4(-(la + la + lb) / 3))))
    assert(full(2L) === ((2L, 1L, r4(-lb))))
    // vocabSize=1 keeps only 'a' (count desc, word asc); b and c hit the
    // 1/total floor — same value as lb here, but through the OOV branch
    val capped = TrainingPrep.lmScore(docs, docs, vocabSize = 1)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(capped(2L) === r4(-lb))
  }

  test("maskTokens: deterministic positions, rate bounds, empty doc " +
    "stays empty, rate 0/1 degenerate") {
    val docs = ((1 to 50).map(i =>
      (i.toLong, (1 to 40).map(j => s"w$j").mkString(" "))) :+
      (99L, "")).toDF("doc_id", "text")
    val a = graft.ops.TrainingPrep.maskTokens(docs, 0.15)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    val b = graft.ops.TrainingPrep.maskTokens(docs.repartition(5), 0.15)
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(a === b) // partitioning-independent
    assert(a(99L)._2 === "" && a(99L)._3 === 0L && a(99L)._4 === 0L)
    val totalMasked = a.values.filter(_._1 != 99L).map(_._4).sum
    assert(totalMasked > 100 && totalMasked < 500, // ~300 expected of 2000
      s"mask rate off: $totalMasked of 2000")
    // degenerate rates
    val none = graft.ops.TrainingPrep.maskTokens(docs, 0.0)
      .agg(sum("n_masked")).as[Long].collect().head
    assert(none === 0L)
    val all = graft.ops.TrainingPrep.maskTokens(docs, 1.0)
      .filter(col("doc_id") =!= 99L)
      .select((col("n_masked") === col("n_tokens")).as("f"))
      .as[Boolean].collect()
    assert(all.forall(identity))
  }

  test("samplePerKey: k stable rows per key, partitioning-independent, " +
    "seed changes the draw") {
    val df = (1 to 200).map(i => (i.toLong, s"src${i % 4}"))
      .toDF("doc_id", "source")
    def draw(d: org.apache.spark.sql.DataFrame, seed: String) =
      graft.ops.TrainingPrep.samplePerKey(d, k = 3, seed = seed)
        .as[(String, Long, Long)].collect().toSet
    val a = draw(df, "sample")
    assert(a.size === 12) // 4 sources × 3
    assert(a === draw(df.repartition(7), "sample"))
    assert(a !== draw(df, "other-seed"))
    // a re-crawled doc keeps its draw: sampling a superset keeps every
    // previously-sampled id whose draw still ranks in the top k... the
    // stronger stable property: the same ids re-sample identically
    assert(a === draw(df.orderBy(col("doc_id").desc), "sample"))
  }

  test("lmScoreBigram: golden interpolated scores, first word unigram, " +
    "OOV floor, unseen-bigram backoff") {
    // reference: "a b a b a" + "a c" -> unigrams a:4 b:2 c:1 (total 7);
    // bigrams: (a,b):2 (b,a):2 (a,c):1; P(b|a)=2/4, P(a|b)=2/2, P(c|a)=1/4
    val ref = Seq((1L, "a b a b a"), (2L, "a c")).toDF("doc_id", "text")
    // scored doc "a b z": pos1 unigram P(a)=4/7; pos2 0.7*P(b|a)+0.3*P(b)
    //   = .35+3/35; pos3 z: unseen bigram AND OOV -> 0.7*0 + 0.3*(1/7)
    val docs = Seq((10L, "a b z")).toDF("doc_id", "text")
    val got = graft.ops.TrainingPrep
      .lmScoreBigram(docs, ref, vocabSize = 10, bigramSize = 10)
      .as[(Long, Long, Double)].collect().head
    val p1 = 4.0 / 7.0
    val p2 = 0.7 * (2.0 / 4.0) + 0.3 * (2.0 / 7.0)
    val p3 = 0.7 * 0.0 + 0.3 * (1.0 / 7.0)
    val want = BigDecimal(
      -(math.log(p1) + math.log(p2) + math.log(p3)) / 3.0)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._2 === 3L)
    assert(math.abs(got._3 - want) < 5e-4, s"got ${got._3}, want $want")
  }

  test("packSequences: per-shard contiguous bins, oversize doc spans") {
    // one shard (shards=1) for a deterministic hand-check: token counts
    // 3, 4, 10, 2 with budget 5 -> exclusive prefix sums 0,3,7,17 ->
    // bins 0,0,1,3 (the 10-token doc starts bin 1 and pushes the next
    // doc past bin 2 entirely)
    val docs = Seq(
      (0L, "w w w"), (1L, "x x x x"),
      (2L, (1 to 10).map(_ => "y").mkString(" ")), (3L, "z z"))
      .toDF("doc_id", "text")
    val got = TrainingPrep.packSequences(docs, budgetTokens = 5, shards = 1)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (0L, 0L, 0L, 3L), (1L, 0L, 0L, 4L),
      (2L, 0L, 1L, 10L), (3L, 0L, 3L, 2L)))
    // sharding: bins are computed within shards, ids keep their shard
    val sharded = TrainingPrep.packSequences(docs, budgetTokens = 5,
      shards = 2).as[(Long, Long, Long, Long)].collect()
    assert(sharded.forall(r => r._2 === r._1 % 2))
  }

  test("packTokens: materialized bins hold id-ordered streams that " +
    "round-trip; token totals conserved") {
    val docs = Seq((0L, "low low"), (1L, "lower low"), (2L, "newest"),
      (3L, "low newest lower")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, numMerges = 4, minFrequency = 1)
    val enc = Bpe.encode(docs, merges).collect()
      .map(r => r.getLong(0) -> (r.getSeq[String](1), r.getLong(2))).toMap
    val got = TrainingPrep.packTokens(docs, merges, budgetTokens = 6,
        shards = 1)
      .collect().map(r => (r.getLong(1), r.getSeq[Long](2),
        r.getSeq[String](3), r.getLong(4))).sortBy(_._1)
    // every bin's stream is the concatenation of its docs' streams in id
    // order, and totals conserve
    for ((_, ids, toks, n) <- got) {
      assert(toks === ids.flatMap(id => enc(id)._1))
      assert(n === ids.map(id => enc(id)._2).sum)
    }
    // all docs packed exactly once, in id order across bins
    assert(got.flatMap(_._2).toSeq === Seq(0L, 1L, 2L, 3L))
    assert(got.map(_._4).sum === enc.values.map(_._2).sum)
    // exclusive-prefix-sum binning: a bin starts strictly under budget
    val binStarts = got.map(_._1)
    assert(binStarts === binStarts.sorted)
  }

  test("packTokens is bit-identical under varied shuffle partitioning " +
    "(x5 runs — the t_pack_ids stability contract)") {
    // heavy duplicate words + id-gapped docs: the corpus shape where any
    // order-sensitivity in the flatten/sort-under-aggregation chain or
    // the prefix-sum window would actually show
    val rnd = new scala.util.Random(101)
    val docs = (0 until 300).map { i =>
      (i.toLong * 3, // gapped ids: shards are NOT contiguous id runs
        (0 to rnd.nextInt(39)).map(_ => s"w${rnd.nextInt(40)}")
          .mkString(" "))
    }.toDF("doc_id", "text")
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val runs = Seq(1, 3, 7, 17, 32).map { p =>
      try {
        spark.conf.set("spark.sql.shuffle.partitions", p.toString)
        TrainingPrep.packTokens(docs.repartition(p), Seq.empty,
            budgetTokens = 64, shards = 8)
          .select(col("shard"), col("bin"),
            concat_ws(",", transform(col("doc_ids"),
              x => x.cast("string"))).as("ids"),
            md5(concat_ws("", col("tokens"))).as("fp"), col("n_tokens"))
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
            r.getString(3), r.getLong(4))).toSet
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    runs.sliding(2).foreach {
      case Seq(a, b) =>
        assert(a === b, "packTokens output drifted across partitionings")
      case _ => ()
    }
  }

  test("capPerSource: best-k per source by (score desc, id asc), " +
    "no window in the plan") {
    val docs = Seq(
      (Some(1L), "a", Some(10L)), (Some(2L), "a", Some(30L)),
      (Some(3L), "a", Some(30L)), (Some(4L), "a", Some(20L)),
      (Some(5L), "b", Some(7L)), (Some(6L), "b", Some(9L)),
      (Some(7L), "c", Some(1L)),
      (Some(8L), "a", None),  // NULL score: excluded, must not crash
      (None, "b", Some(99L))) // NULL id: excluded, must not crash
      .toDF("doc_id", "source", "n_chars")
    val out = TrainingPrep.capPerSource(docs, k = 2, score = col("n_chars"))
    // ties (30,30) break by doc_id asc; source 'c' keeps its single doc
    val got = out.as[(String, Long, Long, Double)].collect().toSet
    assert(got === Set(
      ("a", 1L, 2L, 30.0), ("a", 2L, 3L, 30.0),
      ("b", 1L, 6L, 9.0), ("b", 2L, 5L, 7.0),
      ("c", 1L, 7L, 1.0)))
    // the whole point vs row_number().over(partitionBy(source)): the hot
    // source must NOT funnel through a window operator
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "per-source cap must not use a window")
    intercept[IllegalArgumentException](
      TrainingPrep.capPerSource(docs, k = 0, score = col("n_chars")))
  }

  test("shuffleShards: reproducible permutation, contiguous per-shard " +
    "positions, seed changes the order") {
    val docs = (0L until 300L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val a = TrainingPrep.shuffleShards(docs, shards = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val b = TrainingPrep.shuffleShards(docs, shards = 4)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(a.toSeq === b.toSeq) // identical permutation on re-run
    assert(a.forall(r => r._2 >= 0 && r._2 < 4))
    // positions are 1..n_shard contiguous within each shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === (1L to rows.length).toSeq)
    }
    // a different seed yields a genuinely different order
    val c = TrainingPrep.shuffleShards(docs, shards = 4, seed = "epoch2")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(c.toSeq !== a.toSeq)
  }

  test("quantileBand: keeps the middle band inclusively, bounds near " +
    "exact quantiles at high accuracy") {
    val docs = (1 to 100).map(i => (i.toLong, i.toLong))
      .toDF("doc_id", "n_chars")
    val kept = TrainingPrep.quantileBand(docs, col("n_chars"), 0.2, 0.8)
      .as[(Long, Long)].collect().map(_._2).sorted
    // at accuracy 10000 over 100 distinct values the sketch is exact:
    // thresholds are data values at ranks ~20 and ~80
    assert(kept.head >= 19L && kept.head <= 21L, s"lo ${kept.head}")
    assert(kept.last >= 79L && kept.last <= 81L, s"hi ${kept.last}")
    assert(kept.length >= 58 && kept.length <= 63, s"n ${kept.length}")
    intercept[IllegalArgumentException](
      TrainingPrep.quantileBand(docs, col("n_chars"), 0.8, 0.2))
  }

  test("vocabulary: frequency order with word tie-break, coverage " +
    "reaches 1 when V covers the vocab") {
    val docs = Seq((1L, "b a a"), (2L, "a b c")).toDF("doc_id", "text")
    val got = TrainingPrep.vocabulary(docs, topV = 10)
      .as[(Long, String, Long, Double, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3)) ===
      Seq((1L, "a", 3L), (2L, "b", 2L), (3L, "c", 1L)))
    assert(got.map(_._4) === Seq(0.5, 0.333333, 0.166667))
    assert(got.last._5 === 1.0) // cumulative coverage closes the corpus
    // truncation keeps the best-first prefix
    val top1 = TrainingPrep.vocabulary(docs, topV = 1)
      .as[(Long, String, Long, Double, Double)].collect().toSeq
    assert(top1.map(_._2) === Seq("a") && top1.head._5 === 0.5)
  }

  test("chunk: overlap windows, short doc, exact multiple, empty doc") {
    // chunkTokens=5, overlap=2 -> stride 3
    val docs = Seq(
      (0L, (1 to 9).map(i => s"t$i").mkString(" ")), // 9 toks: 3 chunks
      (1L, "a b c"),                                 // short: 1 chunk
      (2L, (1 to 10).map(i => s"u$i").mkString(" ")),// 10 toks: 3 chunks
      (3L, "   "),                                   // whitespace: none
      (4L, (1 to 11).map(i => s"v$i").mkString(" "))) // 11 toks: 3 chunks
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunk(docs, chunkTokens = 5, overlap = 2)
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    assert(got(0L).map(c => (c._3, c._4)) === Seq(
      ("t1 t2 t3 t4 t5", 5L), ("t4 t5 t6 t7 t8", 5L), ("t7 t8 t9", 3L)))
    assert(got(1L) === Seq((1L, 0L, "a b c", 3L)))
    assert(got(2L).map(_._3) ===
      Seq("u1 u2 u3 u4 u5", "u4 u5 u6 u7 u8", "u7 u8 u9 u10"))
    assert(!got.contains(3L))
    assert(got(4L).size === 3)
    // every token of every doc is covered by at least one chunk
    assert(got(4L).map(_._3.split(" ").toSet).reduce(_ ++ _).size === 11)
    intercept[IllegalArgumentException](
      TextAnalysis.chunk(docs, chunkTokens = 5, overlap = 5))
  }

  test("leakageSafeSplit: every member of a duplicate cluster lands in " +
    "ONE split, drawn from the min-id representative") {
    val docs = ((0L until 300L).map(i => (i, s"unique doc $i")) ++
      // 50 exact copies (modulo whitespace/case, the fingerprint
      // normalization) of doc 7's text under fresh ids
      (1000L until 1050L).map(i => (i, "UNIQUE   doc 7 ")))
      .toDF("doc_id", "text")
    val got = TrainingPrep.leakageSafeSplit(docs,
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("doc_id", "cluster_rep", "split")
      .as[(Long, Long, String)].collect()
    assert(got.length == 350)
    // doc 7's normalized text = "unique doc 7" = the copies' → one
    // cluster, rep = min id = 7, ONE split for all 51 members
    val cluster = got.filter(r => r._1 == 7L || r._1 >= 1000L)
    assert(cluster.length == 51)
    assert(cluster.map(_._2).toSet == Set(7L))
    assert(cluster.map(_._3).toSet.size == 1)
    // a singleton doc's rep is itself, and its split equals hashSplit's
    val solo = got.find(_._1 == 12L).get
    assert(solo._2 == 12L)
    val plain = TrainingPrep.hashSplit(docs.filter(col("doc_id") === 12L),
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
      .select("split").as[String].collect().head
    assert(solo._3 == plain)
  }

  test("prioritySample: deterministic, exactly k, weight-monotone") {
    val docs = (0L until 500L).map(i => (i, 10L + i % 50))
      .toDF("doc_id", "w0")
    val a = TrainingPrep.prioritySample(docs, k = 40, weight = col("w0"))
      .select("doc_id").as[Long].collect().toSet
    val b = TrainingPrep.prioritySample(docs, k = 40, weight = col("w0"))
      .select("doc_id").as[Long].collect().toSet
    assert(a == b && a.size == 40)
    // inflating one unselected row's weight enough always selects it:
    // priority = w·10⁶/draw with draw ≤ 10⁶, so w > max(all priorities)
    // guarantees the top slot
    val out = docs.filter(!col("doc_id").isin(a.toSeq: _*)).limit(1)
      .select("doc_id").as[Long].collect().head
    val boosted = docs.withColumn("w0",
      when(col("doc_id") === out, lit(100000000000L)).otherwise(col("w0")))
    val c = TrainingPrep.prioritySample(boosted, k = 40, weight = col("w0"))
      .select("doc_id").as[Long].collect().toSet
    assert(c.contains(out))
  }

  test("prioritySample: heavier corpora are sampled more often") {
    // two strata of equal size, weights 1 vs 9 → the heavy stratum must
    // dominate the sample (statistical, but deterministic given the
    // fixed md5 draws)
    val docs = (0L until 1000L).map(i => (i, if (i < 500) 1L else 9L))
      .toDF("doc_id", "w0")
    val got = TrainingPrep.prioritySample(docs, k = 100, weight = col("w0"))
      .select("doc_id").as[Long].collect()
    val heavy = got.count(_ >= 500L)
    assert(heavy > 70, s"heavy stratum got $heavy of 100")
  }

  test("groupSample: exactly min(k, |group|) per group, deterministic " +
    "across runs and partitionings, selection = k smallest md5 draws") {
    val rows = (0L until 300L).map(i => (s"g${i % 3}", i))
      .toDF("grp", "id")
    def run(parts: Int): Map[String, Set[Long]] =
      TrainingPrep.groupSample(rows.repartition(parts), Seq("grp"),
          k = 10, idCol = "id")
        .select("grp", "id").as[(String, Long)].collect()
        .groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2).toSet }
    val a = run(2); val b = run(7)
    assert(a == b)
    assert(a.values.forall(_.size == 10))
    // selection = the 10 smallest draws, checked against a manual md5
    val draws = rows.select(col("grp"), col("id"),
        conv(substring(md5(concat(col("id").cast("string"),
          lit(":group-sample"))), 1, 8), 16, 10).cast("long").as("dr"))
      .as[(String, Long, Long)].collect()
    val wantG0 = draws.filter(_._1 == "g0").sortBy(r => (r._3, r._2))
      .take(10).map(_._2).toSet
    assert(a("g0") == wantG0)
    // a group smaller than k returns whole-group
    val tiny = TrainingPrep.groupSample(
        rows.filter(col("id") < 4), Seq("grp"), k = 10, idCol = "id")
      .select("id").as[Long].collect().toSet
    assert(tiny == Set(0L, 1L, 2L, 3L))
    intercept[IllegalArgumentException](
      TrainingPrep.groupSample(rows, Seq.empty, k = 1, idCol = "id"))
    intercept[IllegalArgumentException](
      TrainingPrep.groupSample(rows, Seq("grp"), k = 0, idCol = "id"))
  }

  test("prioritySample fails fast on non-positive weight and bad k") {
    val docs = Seq((1L, 0L), (2L, 3L)).toDF("doc_id", "w0")
    val ex = intercept[Exception](
      TrainingPrep.prioritySample(docs, k = 1, weight = col("w0")).collect())
    assert(ex.getMessage.contains("weight must be positive"))
    intercept[IllegalArgumentException](
      TrainingPrep.prioritySample(docs, k = 0, weight = col("w0")))
  }
}
