package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def one(text: String, c: org.apache.spark.sql.Column): Any =
    Seq(text).toDF("text").select(c.as("r")).collect().head.get(0)

  test("stripMarkup: script/style blocks vanish wholesale, tags become " +
    "spaces, entities decode (&amp; last), unknown entities survive") {
    def strip(s: String): String =
      one(s, TextAnalysis.stripMarkup(col("text"))).asInstanceOf[String]
    assert(strip("<p>hello <b>world</b></p>") === "hello world")
    // naive tag-strip would leak the script body's "1 2;"
    assert(strip("<script>var x = 1 < 2;</script>after") === "after")
    assert(strip("<style>.a{x}</style>text") === "text")
    // multi-line lazy block match
    assert(strip("<script type=\"a\">\nline1\nline2</script>ok") === "ok")
    // tags as separators: </p><p> must not glue words
    assert(strip("<p>one</p><p>two</p>") === "one two")
    assert(strip("T&amp;C &lt;x&gt; &quot;q&quot; &#39;a&#39;&nbsp;b")
      === "T&C <x> \"q\" 'a' b")
    // &amp; decodes LAST: &amp;lt; is the literal text "&lt;", not "<"
    assert(strip("&amp;lt;") === "&lt;")
    assert(strip("&copy; stays") === "&copy; stays")
    assert(strip("  a\t\tb\n c  ") === "a b c")
  }

  test("ngramCounts: positional grams over normalized tokens, short " +
    "docs contribute nothing, tail pruned below minCount") {
    val docs = Seq("a b C  b c", "b\tc b", "x").toDF("text")
    val got = TextAnalysis.ngramCounts(docs, "text", n = 2, minCount = 1L)
      .as[(String, Long)].collect().toMap
    assert(got === Map("a b" -> 1L, "b c" -> 3L, "c b" -> 2L))
    val pruned = TextAnalysis
      .ngramCounts(docs, "text", n = 2, minCount = 2L)
      .as[(String, Long)].collect().toMap
    assert(pruned === Map("b c" -> 3L, "c b" -> 2L))
    // n longer than every doc: empty, not an error
    assert(TextAnalysis.ngramCounts(docs, "text", n = 9).count() === 0L)
  }

  test("url accessors: scheme/host/domain/path across userinfo, ports, " +
    "case, ccTLD suffixes, and degenerate hosts") {
    def parts(u: String): (String, String, String, String) = {
      val r = Seq(u).toDF("text").select(
        TextAnalysis.urlScheme(col("text")).as("s"),
        TextAnalysis.urlHost(col("text")).as("h"),
        TextAnalysis.urlDomain(TextAnalysis.urlHost(col("text"))).as("d"),
        TextAnalysis.urlPath(col("text")).as("p"))
        .as[(String, String, String, String)].collect().head
      r
    }
    assert(parts("https://User:pw@Sub.Example.CO.UK:8080/a/b?q=1#f") ===
      (("https", "sub.example.co.uk", "example.co.uk", "/a/b")))
    assert(parts("http://a.b.example.com/x") ===
      (("http", "a.b.example.com", "example.com", "/x")))
    // no path -> "/", query/fragment excluded
    assert(parts("http://example.org?q=1") ===
      (("http", "example.org", "example.org", "/")))
    // single-label host falls back to itself as the domain
    assert(parts("http://localhost:9000/health") ===
      (("http", "localhost", "localhost", "/health")))
    // not an absolute URL: empty scheme/host, path defaults
    assert(parts("not a url") === (("", "", "", "/")))
  }

  test("urlDomainWithSuffixes: broadcast longest-match PSL beats the " +
    "heuristic on multi-label suffixes; fallback and suffix-host edges") {
    val suffixes = Seq("com", "uk", "co.uk", "us", "ma.us", "k12.ma.us",
      "pvt.k12.ma.us", "io", "github.io").toDF("suffix")
    val hosts = Seq(
      "site.pvt.k12.ma.us",  // 4-label suffix the heuristic truncates
      "pages.github.io",     // private-registry suffix
      "www.example.co.uk",
      "example.com",
      "co.uk",               // host IS a suffix -> itself
      "localhost",           // unlisted -> heuristic fallback
      "internal.example"     // unlisted 2-label -> heuristic fallback
    ).toDF("host")
    val got = TextAnalysis.urlDomainWithSuffixes(hosts, suffixes)
      .as[(String, String)].collect().toMap
    assert(got("site.pvt.k12.ma.us") === "site.pvt.k12.ma.us")
    assert(got("pages.github.io") === "pages.github.io")
    assert(got("www.example.co.uk") === "example.co.uk")
    assert(got("example.com") === "example.com")
    assert(got("co.uk") === "co.uk")
    assert(got("localhost") === "localhost")
    assert(got("internal.example") === "internal.example")
    // the heuristic alone gets the multi-label cases WRONG — the gap
    // this operator closes
    val heur = hosts.select(col("host"),
      TextAnalysis.urlDomain(col("host")).as("d"))
      .as[(String, String)].collect().toMap
    assert(heur("site.pvt.k12.ma.us") === "ma.us")
    assert(heur("pages.github.io") === "github.io")
  }

  test("token counts: whitespace and BPE-ish") {
    assert(one("the quick  brown fox", TextAnalysis.tokenCount(col("text"))) === 4)
    assert(one("", TextAnalysis.tokenCount(col("text"))) === 0)
    assert(one("  ", TextAnalysis.tokenCount(col("text"))) === 0)
    // don't, 2x  -> [don]['][t][,][2][x] = 6
    assert(one("don't, 2x", TextAnalysis.bpeTokenCount(col("text"))) === 6)
  }

  test("normalization + fingerprint are whitespace/case-insensitive") {
    val a = one("Hello  World", TextAnalysis.fingerprint(col("text")))
    val b = one(" hello world ", TextAnalysis.fingerprint(col("text")))
    val c = one("hello worlds", TextAnalysis.fingerprint(col("text")))
    assert(a === b)
    assert(a !== c)
  }

  test("redact: urls, emails, long digit runs; short numbers survive") {
    val got = one("mail me at a.b+c@mail.example.org or " +
      "http://x.io/p?q=1#frag - id 9876543210, year 2026, pin 123456",
      TextAnalysis.redact(col("text")))
    assert(got === "mail me at <EMAIL> or <URL> - id <NUM>, " +
      "year 2026, pin <NUM>")
    // URL applied first: an email-looking string inside a URL is not
    // half-rewritten
    assert(one("see https://x.io/u@v.com rest",
      TextAnalysis.redact(col("text"))) === "see <URL> rest")
  }

  test("repetition metrics: golden fractions, single-word and clean docs") {
    val df = Seq(
      (1L, "the cat sat on the mat the cat"), // 8 words
      (2L, "unique words only here"),
      (3L, "spam"),
      (4L, "go go go go"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.repetitionMetrics(df).drop("text")
      .as[(Long, Int, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1: 8 words, 5 distinct (the×3, cat×2) → dup 3/8; bigrams 7
    // with "the cat" twice → dup 1/7; max freq "the" 3/8
    assert(got(1L) === ((1L, 8, 0.375, 0.1429, 0.375)))
    assert(got(2L) === ((2L, 4, 0.0, 0.0, 0.25)))
    assert(got(3L) === ((3L, 1, 0.0, 0.0, 1.0)))
    // doc 4: all same word → dup 3/4; bigrams all "go go" → dup 2/3
    assert(got(4L) === ((4L, 4, 0.75, 0.6667, 1.0)))
  }

  test("winnowing property: docs sharing a substring of length >= w+k-1 " +
    "share a fingerprint (randomized)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // deterministic Gen loop (scalatestplus bridge absent offline — same
    // pattern as CuriesSpec)
    val lower = Gen.listOfN(40, Gen.alphaLowerChar).map(_.mkString)
    val shared = Gen.listOfN(15, Gen.alphaLowerChar).map(_.mkString)
    (1 to 30).foreach { i =>
      val params = Gen.Parameters.default
      val (a, b, c, s) = (for {
        a <- lower; b <- lower; c <- lower; s <- shared
      } yield (a, b, c, s)).apply(params, Seed(i.toLong)).get
      // k=8, w=4 -> any shared run of >= 11 chars guarantees a shared
      // selected fingerprint; s is 15 chars embedded in unrelated noise
      val fps = Seq((1L, s"$a $s $b"), (2L, s"$c $s $a"))
        .toDF("doc_id", "text")
        .select(col("doc_id"),
          TextAnalysis.winnowFingerprints(col("text")).as("fp"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(fps(1L).toSet.intersect(fps(2L).toSet).nonEmpty,
        s"seed $i: no shared fingerprint for shared substring '$s'")
    }
  }

  test("winnowing: guarantee, density, degenerate inputs") {
    def fps(text: String): Seq[Long] =
      one(text, TextAnalysis.winnowFingerprints(col("text")))
        .asInstanceOf[scala.collection.Seq[Long]].toSeq
    val base = "the quick brown fox jumps over the lazy dog again and again"
    // identical (modulo normalization) texts → identical fingerprint sets
    assert(fps(base) === fps("  THE quick  brown fox jumps over " +
      "the lazy dog again and again "))
    // winnowing guarantee: an inserted prefix keeps shared-substring
    // fingerprints — overlap must be large, not merely nonempty
    val shifted = fps("xyzzy quux " + base)
    val inter = fps(base).toSet.intersect(shifted.toSet).size.toDouble
    val union = fps(base).toSet.union(shifted.toSet).size.toDouble
    assert(inter / union > 0.5, s"shift overlap ${inter / union}")
    // unrelated text shares (essentially) nothing
    val other = fps("completamente distinto en otro idioma sin solapamiento")
    assert(fps(base).toSet.intersect(other.toSet).isEmpty)
    // density ≈ 2/(w+1) of grams, far below one-per-gram
    assert(fps(base).size < base.length - 7)
    // shorter than k → single whole-text hash; sorted distinct output
    assert(fps("tiny").size === 1)
    assert(fps(base) === fps(base).sorted)
  }

  test("langId: latin languages via word-bounded markers") {
    assert(one("the cat is on the mat and a dog",
      TextAnalysis.langId(col("text"))) === "en")
    assert(one("der Hund und die Katze ist da",
      TextAnalysis.langId(col("text"))) === "de")
    assert(one("xyzzy qwerty", TextAnalysis.langId(col("text"))) === "und")
  }

  test("langId: CJK markers match without word boundaries (ADVICE fix)") {
    assert(one("我在家里的时候是最开心的", TextAnalysis.langId(col("text"))) === "zh")
  }

  test("wordShingles: sorted distinct n-grams; short text = whole text") {
    assert(one("a b c d", TextAnalysis.wordShingles(col("text"), 3)) ===
      Seq("a b c", "b c d"))
    assert(one("a b", TextAnalysis.wordShingles(col("text"), 3)) === Seq("a b"))
  }

  test("quality metrics compute ratios with null-safe denominators") {
    val r = TextAnalysis.qualityMetrics(Seq("The cat, the hat!").toDF("text"))
      .collect().head
    assert(r.getAs[Int]("n_tokens") === 4)
    assert(r.getAs[Double]("punct_ratio") > 0)
    assert(r.getAs[Double]("alpha_ratio") > 0.5)
  }

  test("bloom decontamination: planted probe overlap is always flagged " +
    "(no false negatives); disjoint corpus stays below the fp bound") {
    val probes = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs"))
      .toDF("doc_id", "text")
    // doc 10 embeds a probe 3-gram run; docs 11-40 are disjoint
    val corpus = (Seq(
      (10L, "intro words the quick brown fox jumps outro words")) ++
      (11L to 40L).map(i => (i, s"unico$i testo$i nessuna$i overlap$i " +
        s"qui$i affatto$i mai$i")))
      .toDF("doc_id", "text")
    val bloom = TextAnalysis.shingleBloom(probes, n = 3,
      expectedItems = 1000L, numBits = 10000L)
    val flagged = TextAnalysis.bloomContaminated(corpus, bloom, n = 3)
      .as[(Long, Long)].collect().toMap
    // doc 10 shares the 3-grams of "the quick brown fox jumps":
    // 3 contiguous shingles — every one MUST be flagged
    assert(flagged.getOrElse(10L, 0L) >= 3L)
    // disjoint docs: each has 5 distinct shingles; at ~1% fp the total
    // false flags over 150 tests stay far below 10% of them
    val falseFlags = flagged.filterNot(_._1 == 10L).values.sum
    assert(falseFlags <= 15L, s"fp mass too high: $falseFlags")
  }

  test("contaminationReport: fractions, zero-hit docs included") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"), // partial hit
      (2L, "totally clean text with no overlap at all here")) // zero hits
      .toDF("doc_id", "text")
    val probes = Seq((9L, "quick brown fox sentences are classic probes"))
      .toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.contaminationReport(corpus, probes)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, n1, h1, f1) = got(1L)
    assert(h1 === 1L) // shared 3-gram: "quick brown fox"
    assert(f1 === h1.toDouble / n1)
    val (_, _, h2, f2) = got(2L)
    assert(h2 === 0L && f2 === 0.0)
  }

  test("gopherRules: each rule trips on its own construction") {
    val good = ("the project is a sample of plain english prose and " +
      "it keeps going with more of the usual words ") * 3 // ~60 words
    val docs = Seq(
      0L -> good,                                          // keep
      1L -> "too few words here",                          // word count
      2L -> (Seq.fill(60)("extraordinarily" + "x" * 10).mkString(" ") +
        " the a of and is"),                               // mean word len
      3L -> (good + " " + Seq.fill(20)("#").mkString(" ")), // symbol ratio
      4L -> (1 to 10).map(i => s"- bullet item $i of the list")
        .mkString("\n"),                                   // bullet lines
      5L -> good.split(" ").grouped(8).map(_.mkString(" ") + " ...")
        .mkString("\n"),                                   // ellipsis lines
      6L -> (Seq.fill(60)("12345").mkString(" ") +
        " the a of and is"),                               // alpha words
      7L -> Seq.fill(60)("zzz").mkString(" "))             // stopwords
      .toDF("doc_id", "text")
    val got = graft.ops.TextAnalysis.gopherRules(docs, minWords = 40)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    def rule(id: Long, name: String): Boolean =
      got(id).getAs[Boolean](name)
    assert(rule(0L, "keep"))
    assert(!rule(1L, "ok_word_count") && !rule(1L, "keep"))
    assert(!rule(2L, "ok_mean_word_len") && !rule(2L, "keep"))
    assert(!rule(3L, "ok_symbol_ratio") && !rule(3L, "keep"))
    assert(!rule(4L, "ok_bullet_ratio") && !rule(4L, "keep"))
    assert(!rule(5L, "ok_ellipsis_ratio") && !rule(5L, "keep"))
    assert(!rule(6L, "ok_alpha_words") && !rule(6L, "keep"))
    assert(!rule(7L, "ok_stopwords") && !rule(7L, "keep"))
  }
}

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("exactSurvivorsBy: highest score wins the cluster, min id on ties") {
    val docs = Seq(
      (1L, "same text", 10.0), (2L, "same  TEXT ", 30.0), // dup cluster
      (3L, "same text", 30.0),                            // score tie w/ 2
      (4L, "unique here", 5.0))
      .toDF("doc_id", "text", "w")
    val got = graft.ops.Dedup.exactSurvivorsBy(docs, col("w"))
      .select("survivor_id", "score", "n_copies")
      .as[(Long, Double, Long)].collect().sortBy(_._1)
    // cluster {1,2,3}: max score 30 shared by 2 and 3 -> min id 2 wins
    assert(got === Array((2L, 30.0, 3L), (4L, 5.0, 1L)))
  }

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "The quick  brown fox jumps over the lazy dog"), // exact dup modulo ws/case
    (3L, "the quick brown fox jumps over the lazy cat"),  // near dup
    (4L, "completely different text about spark engines here"),
    (5L, "the quick brown fox jumps over the lazy dog")   // exact dup
  ).toDF("doc_id", "text")

  test("exact dedup groups normalized duplicates, keeps min id") {
    val surv = Dedup.exactSurvivors(docs)
      .select("survivor_id", "n_copies").as[(Long, Long)].collect().toMap
    assert(surv === Map(1L -> 3L, 3L -> 1L, 4L -> 1L))
  }

  test("simHashPairs: exact dups recovered (Hamming 0), in-radius pairs " +
    "guaranteed by the band pigeonhole, out-of-radius pairs excluded") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "The quick  brown fox jumps over the LAZY dog"), // normalized dup
      (3L, "completely different text about spark engines here"),
      (4L, "completely different text about spark engines here"))
      .toDF("doc_id", "text")
    val pairs = Dedup.simHashPairs(corpus, n = 3, maxHamming = 3)
      .as[(Long, Long, Int)].collect().toSet
    // normalized dup + exact dup both sit at Hamming 0
    assert(pairs.contains((1L, 2L, 0)))
    assert(pairs.contains((3L, 4L, 0)))
    // unrelated docs are ~32 bits apart: never within radius 3
    assert(!pairs.exists(p => Set(p._1, p._2) == Set(1L, 3L)))
    assert(pairs.forall(_._3 <= 3))
  }

  test("jaccard pairs find the near-dup, not the unrelated doc") {
    val pairs = Dedup.jaccardPairs(docs, n = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("jaccard pairs equal the brute-force all-pairs answer on a " +
    "mixed-size corpus (r14 size-ratio prefilter drops nothing real)") {
    // sizes straddle the threshold ratio: doc 11 is a SHORT prefix of 10
    // (ratio below 0.5 ⇒ provably under threshold, prefilter territory);
    // 10 vs 12 differ by one word (high jaccard, must survive)
    val corpus = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (11L, "alpha beta gamma delta"),
      (12L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (13L, "unrelated words entirely different from everything else"))
      .toDF("doc_id", "text")
    val got = Dedup.jaccardPairs(corpus, n = 2, threshold = 0.5)
      .as[(Long, Long, Double)].collect().toSet
    // brute force over the same shingle sets
    val sh = Dedup.shingled(corpus, 2).as[(Long, Seq[Long])].collect()
    val brute = (for {
      (a, sa) <- sh; (b, sb) <- sh if a < b
      inter = sa.toSet.intersect(sb.toSet).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= 0.5
    } yield (a, b, j)).toSet
    assert(got === brute)
    assert(got.map(p => (p._1, p._2)) === Set((10L, 12L)))
  }

  test("jaccard pairs: over-maxDF posting lists pair against a " +
    "representative — mass-duplicate clusters are not silently dropped") {
    // 10 identical docs: every shingle's DF is 10 > maxDF=5, so the old
    // drop-the-list behavior emitted ZERO pairs (the ADVICE recall hole)
    val cluster = (1L to 10L).map(i =>
      (i, "massively duplicated template text body of the cluster"))
    val other = Seq((90L, "some unrelated words entirely here to see"))
    val pairs = Dedup.jaccardPairs((cluster ++ other).toDF("doc_id", "text"),
        n = 3, threshold = 0.8, maxDF = 5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // star around the representative (min id): every member connects
    assert(pairs === (2L to 10L).map(i => (1L, i)).toSet)
  }

  test("containment pairs: a prefix document is CONTAINED in its " +
    "extension even where Jaccard misses it; unrelated docs never pair") {
    val base = "alpha beta gamma delta epsilon zeta eta theta"
    val corpus = Seq(
      (1L, base),
      // extension: base + a tail longer than the base → resemblance
      // under 0.5, containment of 1 in 2 still 1.0
      (2L, base + " one two three four five six seven eight nine ten " +
        "eleven twelve thirteen fourteen fifteen sixteen"),
      (3L, "completely different content about distributed engines " +
        "and parquet scans")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(corpus, n = 3, threshold = 0.9)
      .select("id_a", "id_b", "c_a_in_b", "c_b_in_a")
      .as[(Long, Long, Double, Double)].collect()
    assert(got.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    val p = got.head
    assert(p._3 == 1.0, s"prefix must be fully contained: $p")
    assert(p._4 < 0.5, s"extension is NOT contained in the prefix: $p")
    // the same pair is invisible to Jaccard at the same threshold
    val jac = Dedup.jaccardPairs(corpus, n = 3, threshold = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(!jac.contains((1L, 2L)))
    intercept[IllegalArgumentException](
      Dedup.containmentPairs(corpus, n = 3, threshold = 0.0))
  }

  test("minhash-LSH pairs equal exact jaccard pairs at high signal") {
    val exact = Dedup.jaccardPairs(docs, n = 2, threshold = 0.6)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    val lsh = Dedup.minHashPairs(docs, n = 2, threshold = 0.6)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)]
      .collect().toSet
    assert(lsh === exact)
  }

  test("nearDupSurvivors: transitive closure over pair graph, min-id " +
    "survivor, singletons survive alone") {
    val surv = Dedup.nearDupSurvivors(docs, n = 3, threshold = 0.5)
      .as[(Long, Long)].collect().toMap
    // 1,2,5 are exact dups and 3 is a near dup of them -> one cluster
    // rooted at 1; 4 is unrelated -> survives alone
    assert(surv === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 1L, 4L -> 4L))
  }

  test("shingled repartitions only under-parallel inputs") {
    // plan-shape assertion (AQE re-coalesces tiny shuffles, so partition
    // COUNTS don't witness the decision; the added shuffle operator does).
    // shingled's own spread is a BY-EXPRESSION repartition — distinct from
    // the wide fixture's repartition(8), which is a plain Repartition node.
    def spreads(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.analyzed.collect {
        case r: org.apache.spark.sql.catalyst.plans.logical.RepartitionByExpression => r
      }.nonEmpty
    // one partition < defaultParallelism(4): spread before shingling
    assert(spreads(Dedup.shingled(docs.coalesce(1), n = 2)))
    // already-parallel input: no shuffle paid
    assert(!spreads(Dedup.shingled(docs.repartition(8), n = 2)))
  }

  test("simhash: near-identical texts land at small hamming distance") {
    val sh = docs.select(col("doc_id"),
        Dedup.simHash(TextAnalysis.wordShingleHashes(col("text"), 2)).as("h"))
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sh(1L), sh(2L)) === 0)     // identical after normalization
    assert(hamming(sh(1L), sh(3L)) <= 16)     // near dup: close
    assert(hamming(sh(1L), sh(4L)) > 16)      // unrelated: far
  }

  test("duplicateSpans: cross-document repeated run merges into one " +
    "maximal span per document; unique text emits nothing") {
    val corpus = Seq(
      // docs 1 and 2 share the 8-word run "a b c d e f g h"
      (1L, "a b c d e f g h unique1 tail1 x1 y1"),
      (2L, "prefix2 q r s a b c d e f g h suffix2 z2 w2"),
      (3L, "totally distinct words nine ten eleven twelve etc"))
      .toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(corpus, n = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc 1: duplicated 5-grams start at words 0..3 -> span words 0..7
    // doc 2: the run sits at words 4..11 -> grams 4..7 -> span words 4..11
    assert(spans === Set((1L, 0L, 7L, 4L), (2L, 4L, 11L, 4L)))
  }

  test("duplicateSpans: within-document repetition counts toward " +
    "minCount; far-apart repeats stay separate spans") {
    val corpus = Seq(
      (1L, "x1 x2 x3 x4 x5 mid1 mid2 mid3 mid4 mid5 mid6 x1 x2 x3 x4 x5"),
      (2L, "too short"))
      .toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(corpus, n = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    // the 5-gram "x1..x5" occurs at word 0 and word 11 in the SAME doc:
    // start gap 11 > n=5, so two separate whole-gram spans
    assert(spans === Set((1L, 0L, 4L, 1L), (1L, 11L, 15L, 1L)))
  }

  test("cutSpans: covered words are removed, surrounding text survives, " +
    "span-free documents pass through untouched") {
    val corpus = Seq(
      (1L, "a b c d e f g h unique1 tail1 x1 y1"),
      (2L, "prefix2 q r s a b c d e f g h suffix2 z2 w2"),
      (3L, "totally distinct words nine ten eleven twelve etc"))
      .toDF("doc_id", "text")
    val got = Dedup.cutSpans(corpus, n = 5)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1: span words 0..7 cut -> the 4-word tail remains
    assert(got(1L) === ((1L, "unique1 tail1 x1 y1", 4L, 8L)))
    // doc 2: span words 4..11 cut -> prefix + suffix stitched
    assert(got(2L) === ((2L, "prefix2 q r s suffix2 z2 w2", 7L, 8L)))
    // doc 3: no duplicated grams -> full normalized text, nothing removed
    assert(got(3L) ===
      ((3L, "totally distinct words nine ten eleven twelve etc", 8L, 0L)))
  }

  test("cutSpans: a fully-duplicated document is cut to the empty string") {
    val corpus = Seq(
      (1L, "one two three four five"),
      (2L, "one two three four five"))
      .toDF("doc_id", "text")
    val got = Dedup.cutSpans(corpus, n = 5)
      .as[(Long, String, Long, Long)].collect().toSet
    assert(got === Set((1L, "", 0L, 5L), (2L, "", 0L, 5L)))
  }

  test("span operators match a brute-force reference on random " +
    "small-vocab corpora (rich overlap/merge/within-doc structure)") {
    // Many independent random corpora ride ONE DataFrame: suffixing every
    // word with its corpus id makes grams collide only within a corpus,
    // so corpus-frequency semantics stay per-corpus by construction.
    val n = 3
    val rnd = new scala.util.Random(1234)
    val corpora: Seq[(Int, Seq[(Long, String)])] = (0 until 12).map { c =>
      val vocab = 3 + rnd.nextInt(4)
      val docs = (0 until 2 + rnd.nextInt(3)).map { i =>
        val len = rnd.nextInt(26)
        (c * 1000L + i,
          Seq.fill(len)(s"w${rnd.nextInt(vocab)}_c$c").mkString(" "))
      }
      c -> docs
    }
    val all = corpora.flatMap(_._2)
    val gotSpans = Dedup.duplicateSpans(all.toDF("doc_id", "text"), n = n)
      .as[(Long, Long, Long, Long)].collect().toSet
    val gotCut = Dedup.cutSpans(all.toDF("doc_id", "text"), n = n)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

    // brute-force reference, per corpus
    corpora.foreach { case (_, docs) =>
      // engine semantics: an empty doc is one empty word (split("", " "))
      def words(t: String): Array[String] =
        if (t.isEmpty) Array("") else t.split(" ")
      val grams = docs.flatMap { case (id, t) =>
        val w = words(t)
        if (w.length >= n)
          (0 to w.length - n).map(p => (id, p.toLong, w.slice(p, p + n).mkString(" ")))
        else Nil
      }
      val freq = grams.groupBy(_._3).view.mapValues(_.size).toMap
      val marked = grams.filter(g => freq(g._3) >= 2)
      val expSpans = marked.groupBy(_._1).flatMap { case (id, gs) =>
        val ps = gs.map(_._2).sorted
        val runs = ps.foldLeft(List.empty[List[Long]]) {
          case (acc, p) if acc.nonEmpty && p <= acc.head.head + n =>
            (p :: acc.head) :: acc.tail
          case (acc, p) => List(p) :: acc
        }
        runs.map(r => (id, r.min, r.max + (n - 1), r.size.toLong))
      }.toSet
      val expCovered = marked
        .flatMap { case (id, p, _) => (p to p + n - 1).map(id -> _) }.toSet
      docs.foreach { case (id, t) =>
        val w = words(t)
        val kept = w.zipWithIndex.collect {
          case (word, i) if !expCovered(id -> i.toLong) => word }
        val exp = (id, kept.mkString(" "), kept.length.toLong,
          (w.length - kept.length).toLong)
        assert(gotCut(id) === exp, s"cutSpans mismatch for doc $id")
        assert(gotSpans.filter(_._1 == id) === expSpans.filter(_._1 == id),
          s"duplicateSpans mismatch for doc $id")
      }
    }
  }

  test("dedupLines: first occurrence survives, short lines exempt, " +
    "fully-deduped doc stays as empty row") {
    val docs = Seq(
      (1L, "cookie banner\nunique one\n-\nbody a"),
      (2L, "cookie banner\nunique two\n-\nbody b"),
      (3L, "cookie banner"), // every line seen earlier -> empty doc
      (4L, null.asInstanceOf[String])) // NULL text must not drop the row
      .toDF("doc_id", "text")
    val got = Dedup.dedupLines(docs, minLineChars = 2)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1)
    assert(got(0) === ((1L, "cookie banner\nunique one\n-\nbody a", 4L, 0L)))
    // doc 2 loses the banner but keeps its own lines AND the short "-"
    // separator (below minLineChars -> exempt from dedup)
    assert(got(1) === ((2L, "unique two\n-\nbody b", 3L, 1L)))
    // doc 3 loses everything but is still emitted
    assert(got(2) === ((3L, "", 0L, 1L)))
    // doc 4 (NULL text) round-trips as one exempt empty line
    assert(got(3) === ((4L, "", 1L, 0L)))
  }
}

class TextSearchSpec extends graft.SparkSpec {
  import spark.implicits._

  test("bm25: golden scores against the hand-computed Okapi formula") {
    val docs = Seq(
      (1L, "spark spark engine"), // dl 3, tf(spark)=2
      (2L, "vector db"),          // dl 2, tf(vector)=1
      (3L, "the plain text"))     // no query term
      .toDF("doc_id", "text")
    val got = TextSearch.bm25(docs, Seq("spark", "vector"))
      .as[(Long, Long, Double)].collect().toSet
    // N=3, avgdl=8/3, df=1 each: idf = ln(1 + 2.5/1.5) = 0.980829...
    // doc1: 0.980829*2*2.2 / (2 + 1.2*(0.25 + 0.75*3/(8/3))) = 1.30284
    // doc2: 0.980829*1*2.2 / (1 + 1.2*(0.25 + 0.75*2/(8/3))) = 1.09257
    assert(got === Set((1L, 1L, 1.3028), (2L, 1L, 1.0926)))
  }

  test("bm25: rarer term outranks common term at equal tf") {
    val docs = Seq(
      (1L, "alpha beta"), (2L, "alpha gamma"), (3L, "alpha delta"),
      (4L, "rare gamma"))
      .toDF("doc_id", "text")
    val s = TextSearch.bm25(docs, Seq("alpha", "rare"))
      .select("doc_id", "bm25").as[(Long, Double)].collect().toMap
    // df(alpha)=3, df(rare)=1, all dl equal: the rare-term doc wins
    assert(s(4L) > s(1L))
  }
}

class ProfileSpec extends graft.SparkSpec {
  import spark.implicits._

  test("sketchProfile: HLL distinct and quantile sketch sit within " +
    "advertised error of exact answers") {
    val rows = for (k <- Seq("a", "b"); i <- 1 to 2000)
      yield (k, (i % 500).toLong, i.toDouble)
    val df = rows.toDF("event_type", "user_id", "value")
    val got = graft.ops.Profile
      .sketchProfile(df, "event_type", "user_id", "value")
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet === Set("a", "b"))
    got.values.foreach { case (_, n, nd, p50, p95) =>
      assert(n === 2000L)
      assert(math.abs(nd - 500L) <= 25)          // 5% rsd
      assert(math.abs(p50 - 1000.0) <= 40.0)     // 2% of the 1..2000 range
      assert(math.abs(p95 - 1900.0) <= 40.0)
    }
  }

  test("topKFrequent: exact ranks, (count desc, value asc) ties, " +
    "partitioning-independent") {
    // key "a": x×5, y×3, z×3 (tie: y before z), w×1; key "b": q×2, p×2
    val rows = (Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq.fill(3)("z") ++
      Seq("w")).map(("a", _)) ++ Seq.fill(2)("q").map(("b", _)) ++
      Seq.fill(2)("p").map(("b", _))
    val df = rows.toDF("k", "v").repartition(7)
    val got = graft.ops.Profile.topKFrequent(df, "k", "v", k = 3)
      .as[(String, Long, String, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq === Seq(
      ("a", 1L, "x", 5L), ("a", 2L, "y", 3L), ("a", 3L, "z", 3L),
      ("b", 1L, "p", 2L), ("b", 2L, "q", 2L)))
  }
}

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  import graft.functions.Vectors

  test("standardize: per-dimension mean 0 / pop-std 1; zero-variance " +
    "dimension maps to 0.0; driver-reference parity") {
    val vecs = Seq(
      (1L, Array(1.0f, 10.0f, 7.0f)),
      (2L, Array(3.0f, 10.0f, 1.0f)),
      (3L, Array(5.0f, 10.0f, 4.0f))) // dim 1 constant
    val got = Similarity.standardize(vecs.toDF("vec_id", "embedding"))
      .as[(Long, Seq[Double])].collect().toMap
    // driver reference
    val cols = (0 until 3).map(j => vecs.map(_._2(j).toDouble))
    val mus = cols.map(c => c.sum / c.size)
    val sgs = cols.zip(mus).map { case (c, m) =>
      math.sqrt(c.map(x => (x - m) * (x - m)).sum / c.size) }
    for ((id, v) <- vecs) {
      val want = v.toSeq.zipWithIndex.map { case (x, j) =>
        if (sgs(j) == 0.0) 0.0 else (x - mus(j)) / sgs(j) }
      got(id).zip(want).foreach { case (g, w) =>
        assert(math.abs(g - w) < 1e-12, s"id $id") }
    }
    // each non-constant dimension: mean 0, population std 1
    for (j <- Seq(0, 2)) {
      val zs = vecs.map(v => got(v._1)(j))
      assert(math.abs(zs.sum / zs.size) < 1e-12)
      assert(math.abs(math.sqrt(
        zs.map(z => z * z).sum / zs.size) - 1.0) < 1e-12)
    }
    assert(vecs.forall(v => got(v._1)(1) === 0.0), "constant dim -> 0")
  }

  test("vector math: dot/norm/cosine golden values") {
    val df = Seq((Array(1.0f, 2.0f, 2.0f), Array(2.0f, 0.0f, 0.0f)))
      .toDF("a", "b")
    val r = df.select(
      Vectors.dot(Vectors.toDouble(col("a")), Vectors.toDouble(col("b"))).as("d"),
      Vectors.norm(Vectors.toDouble(col("a"))).as("n"),
      Vectors.cosine(col("a"), col("b")).as("c"),
      Vectors.l2Distance(col("a"), col("b")).as("l2")).collect().head
    assert(r.getAs[Double]("d") === 2.0)
    assert(r.getAs[Double]("n") === 3.0)
    assert(math.abs(r.getAs[Double]("c") - 2.0 / 6.0) < 1e-12)
    assert(math.abs(r.getAs[Double]("l2") - 3.0) < 1e-12)
  }

  test("cosine of zero vector is null, not error") {
    val r = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
      .select(graft.functions.Vectors.cosine(col("a"), col("b")).as("c"))
      .collect().head
    assert(r.isNullAt(0))
  }

  test("brute-force top-k ranks by cosine desc with id tiebreak") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(1.0f, 0.05f))
    ).toDF("vec_id", "embedding")
    val queries = Seq((1L, Array(1.0f, 0.0f))).toDF("query_id", "embedding")
    val got = Similarity.bruteForceTopK(corpus, queries, k = 2)
      .select("rank", "id").as[(Long, Long)].collect().sorted
    assert(got === Array((1L, 4L), (2L, 2L))) // 4 closer than 2; self excluded
  }

  test("topKPerQuery: bounded-heap agg equals window ranking incl. ties, " +
    "plan has no Window") {
    // > 4k rows per query so the heap's sort-and-truncate path runs;
    // duplicate cosines so the id tiebreak is exercised.
    val scored = (0 until 50).flatMap(q => (0 until 200).map(i =>
      (q.toLong, i.toLong, (i % 7).toDouble / 7.0)))
      .toDF("query_id", "id", "cosine")
    val k = 5
    val got = Similarity.topKPerQuery(scored, k)
    // reference ranking via the window the aggregator replaced
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cosine").desc, col("id").asc)
    val want = scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "id", "cosine")
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
    assert(plan.contains("ObjectHashAggregate"))
  }

  test("product quantization: codes shape, determinism, ADC recovers " +
    "nearest neighbors") {
    val rnd = new scala.util.Random(11)
    val corpus = (0 until 120).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val cb = ProductQuantization.train(corpus, m = 4, k = 8, iterations = 4,
      sampleSize = 120)
    assert(cb.books.length === 4 && cb.subDim === 4)
    assert(cb.books.forall(b => b.nonEmpty && b.length <= 8))
    // deterministic: retraining on the same corpus gives the same books
    assert(cb === ProductQuantization.train(corpus, m = 4, k = 8,
      iterations = 4, sampleSize = 120))
    val codes = ProductQuantization.encode(corpus, cb)
      .as[(Long, Seq[Int])].collect()
    assert(codes.length === 120)
    assert(codes.forall(c => c._2.length === 4 &&
      c._2.forall(x => x >= 0 && x < 8)))
    // ADC + exact re-rank finds each query's true nearest neighbor: the
    // planted twin at distance ~1e-3
    val twins = (0 until 8).map(i => (i + 1000L,
      corpus.as[(Long, Array[Float])].collect().find(_._1 == i).get._2
        .map(x => x + 0.001f)))
    val full = corpus.unionByName(twins.toDF("vec_id", "embedding"))
    val queries = full.filter(col("vec_id") < 8)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val cbFull = ProductQuantization.train(full, m = 4, k = 8,
      iterations = 4, sampleSize = 200)
    val got = ProductQuantization.adcTopK(full, cbFull, queries, k = 1,
      rerankFrom = 8)
      .select("query_id", "id").as[(Long, Long)].collect().toMap
    val hits = (0L until 8L).count(q => got.get(q).contains(q + 1000L))
    assert(hits >= 7, s"twin recall $hits/8")
  }

  test("PQ encode: every stored code IS the L2-nearest codeword — the " +
    "assignment metric matches lloyd training and the ADC tables") {
    val rnd = new scala.util.Random(23)
    val corpus = (0 until 60).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val cb = ProductQuantization.train(corpus, m = 4, k = 8,
      iterations = 3, sampleSize = 60)
    val got = ProductQuantization.encode(corpus, cb)
      .as[(Long, Seq[Int])].collect().toMap
    corpus.as[(Long, Array[Float])].collect().foreach { case (id, v) =>
      (0 until 4).foreach { mi =>
        val sub = v.slice(mi * 4, mi * 4 + 4).map(_.toDouble)
        val dists = cb.books(mi).map(cw =>
          sub.zip(cw).map { case (a, b) => (a - b) * (a - b) }.sum)
        val best = dists.zipWithIndex.minBy(_._1)._2
        assert(got(id)(mi) === best,
          s"vec $id subspace $mi: code ${got(id)(mi)} != L2 argmin $best")
      }
    }
  }

  test("embeddingPairs: finds perturbed twins, rejects unrelated vectors") {
    val rnd = new scala.util.Random(7)
    val base = (0 until 30).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextGaussian())))
    val twins = base.take(10).map { case (i, v) =>
      (i + 1000L, v.map(_ + 0.001))
    }
    val vecs = (base ++ twins).toDF("vec_id", "embedding")
    val got = Dedup.embeddingPairs(vecs, threshold = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === (0 until 10).map(i => (i.toLong, i + 1000L)).toSet)
  }

  test("IVF top-k: exact at nProbe==nList; subset with true ranks below") {
    val vecs = (0 until 60).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.cos(i * 13 + j * 5).toFloat))
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = vecs.take(3).toDF("query_id", "embedding")
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 4)
    val ivfExact = Similarity.ivfTopK(corpus, queries, k = 4,
      nList = 6, nProbe = 6)
    assert(ivfExact.exceptAll(exact).isEmpty
      && exact.exceptAll(ivfExact).isEmpty)
    // approximate mode returns <= k rows per query, all from the true
    // scored universe
    val approx = Similarity.ivfTopK(corpus, queries, k = 4,
      nList = 6, nProbe = 2).collect()
    assert(approx.nonEmpty && approx.forall(_.getAs[Long]("rank") <= 4))
  }

  test("IVF survives production nList: 512 cells, plan size O(1), " +
    "stays in whole-stage codegen") {
    val vecs = (0 until 1500).map { i =>
      (i.toLong, Array.tabulate(16)(j => math.cos(i * 13 + j * 5).toFloat))
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = vecs.take(2).toDF("query_id", "embedding")
    val got = Similarity.ivfTopK(corpus, queries, k = 3,
      nList = 512, nProbe = 8)
    val rows = got.collect()
    assert(rows.nonEmpty && rows.forall(_.getAs[Long]("rank") <= 3))
    // post-AQE final plan: the old literal-unrolled shape embedded every
    // centroid vector in the plan (O(nList·dim) generated code); the
    // kernel form keeps centroids in ONE reference object
    val plan = got.queryExecution.executedPlan.toString
    assert(!plan.contains("CodegenFallback"),
      s"nearest-cells must not fall back to interpreted eval:\n$plan")
    assert(plan.length < 100000, s"plan grew with nList: ${plan.length}")
  }

  test("k-means refinement: refined IVF at nProbe=1 is exact on " +
    "well-separated clusters") {
    // 3 tight clusters on orthogonal axes; within-cluster cosine ~1,
    // cross-cluster ~0 — after Lloyd refinement each cluster owns one
    // cell, so probing a single cell already yields the exact top-k
    val dims = 8
    val vecs = (0 until 180).map { i =>
      val c = i % 3
      val v = Array.tabulate(dims)(j =>
        (if (j == c) 10.0 else 0.0) + 0.01 * math.cos(i * 7 + j))
      (i.toLong, v)
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = vecs.take(6).toDF("query_id", "embedding")
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 3)
    val refined = Similarity.ivfTopK(corpus, queries, k = 3,
      nList = 3, nProbe = 1, refineIterations = 3)
    assert(refined.exceptAll(exact).isEmpty
      && exact.exceptAll(refined).isEmpty)
    // the refined centroids are driver-sized and aligned with cells
    val (ids, cents) = Similarity.refineCentroids(corpus, nList = 3,
      iterations = 2)
    assert(ids.length === 3 && cents.forall(_.length === dims))
  }

  test("IVF accepts array<double> embeddings (ADVICE fix)") {
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.cos(i * 13 + j * 5)))
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = vecs.take(2).toDF("query_id", "embedding")
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 4)
    val ivf = Similarity.ivfTopK(corpus, queries, k = 4,
      nList = 4, nProbe = 4)
    assert(ivf.exceptAll(exact).isEmpty && exact.exceptAll(ivf).isEmpty)
  }

  test("property: NearestCells kernel ranking == reference cosine sort " +
    "(score desc, cell id desc ties)") {
    import org.apache.spark.sql.graft.ColumnShim
    val rnd = new scala.util.Random(17)
    val cents = (0 until 12).map(_ =>
      Array.fill(6)(rnd.nextGaussian())).toIndexedSeq
    val cellIds = (0 until 12).map(c => (c * 7 + 3).toLong)
    val vecs = (0 until 100).map(i =>
      (i.toLong, Array.fill(6)(rnd.nextGaussian().toFloat))).toDF("id", "v")
    val got = vecs.select(col("id"), ColumnShim.column(
        graft.functions.NearestCells(ColumnShim.expression(col("v")),
          cellIds, cents.map(_.toSeq), 5)).as("cells"))
      .as[(Long, Seq[Long])].collect().toMap
    // reference ranking in plain Scala
    val byId = vecs.as[(Long, Array[Float])].collect().toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot / (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    }
    byId.foreach { case (id, v) =>
      val vd = v.map(_.toDouble)
      val want = cents.zipWithIndex
        .map { case (c, i) => (cos(vd, c), cellIds(i)) }
        .sortBy { case (s, cid) => (-s, -cid) }
        .take(5).map(_._2)
      assert(got(id) === want, s"vector $id")
    }
  }

  test("IvfIndex: persisted index matches brute force in exact mode and " +
    "PRUNES partitions at low nProbe") {
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.cos(i * 13 + j * 5).toFloat))
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = vecs.take(3).toDF("query_id", "embedding")
    val path = tmpDir("ivfindex")
    IvfIndex.build(corpus, path, nList = 8)
    // exact mode: probing every cell == brute force
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 4)
    val viaIndex = IvfIndex.topK(spark, path, queries, k = 4, nProbe = 8)
    assert(viaIndex.exceptAll(exact).isEmpty
      && exact.exceptAll(viaIndex).isEmpty)
    // low-probe mode: the scan must read only the probed cells' files
    val pruned = IvfIndex.topK(spark, path, queries, k = 4, nProbe = 1)
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"probe filter must land in PartitionFilters:\n$plan")
    assert(pruned.count() > 0)
  }

  test("IvfIndex.append: no rewrite of existing files, exact-mode parity " +
    "over the grown corpus, staleness vs build baseline") {
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.cos(i * 13 + j * 5).toFloat))
    }
    val (oldHalf, newHalf) = vecs.partition(_._1 % 2 == 0)
    val path = tmpDir("ivfappend")
    IvfIndex.build(oldHalf.toDF("vec_id", "embedding"), path, nList = 8)
    def corpusFiles(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$path/corpus"))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.length()).toMap
    }
    val before = corpusFiles()
    val stats = IvfIndex.append(spark, path,
      newHalf.toDF("vec_id", "embedding"))
    assert(stats.appended === 100L)
    // same-distribution append: the frozen centroids still fit (tiny drift)
    assert(math.abs(stats.staleness) < 0.2,
      s"unexpected staleness ${stats.staleness}")
    // existing files are untouched (same paths, same sizes) — append-only
    val after = corpusFiles()
    assert(before.forall { case (p, len) => after.get(p).contains(len) },
      "append rewrote existing corpus files")
    assert(after.size > before.size, "append added no files")
    // exact mode over the GROWN corpus equals brute force over all rows
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = vecs.take(3).toDF("query_id", "embedding")
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 4)
    val viaIndex = IvfIndex.topK(spark, path, queries, k = 4, nProbe = 8)
    assert(viaIndex.exceptAll(exact).isEmpty
      && exact.exceptAll(viaIndex).isEmpty)
  }

  test("IvfIndex IVFADC: codes persisted at build AND append, exact-mode " +
    "re-rank parity, partition pruning preserved") {
    val vecs = (0 until 200).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.cos(i * 13 + j * 5).toFloat))
    }
    val (oldHalf, newHalf) = vecs.partition(_._1 % 2 == 0)
    val path = tmpDir("ivfadc")
    IvfIndex.build(oldHalf.toDF("vec_id", "embedding"), path, nList = 8,
      pqM = 4, pqK = 8)
    IvfIndex.append(spark, path, newHalf.toDF("vec_id", "embedding"))
    // every row (built AND appended) carries a full non-null code array
    val codes = spark.read.parquet(s"$path/corpus").select("vec_id", "codes")
      .as[(Long, Seq[Int])].collect()
    assert(codes.length === 200)
    assert(codes.forall(_._2.length === 4), "appended rows missing codes")
    // exact-mode: probe all cells, re-rank from everything -> brute force
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = vecs.take(3).toDF("query_id", "embedding")
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 4)
    val viaAdc = IvfIndex.topKAdc(spark, path, queries, k = 4, nProbe = 8,
      rerankFrom = 200)
    assert(viaAdc.exceptAll(exact).isEmpty
      && exact.exceptAll(viaAdc).isEmpty)
    // pruned probe keeps the partition filter on the code scan
    val pruned = IvfIndex.topKAdc(spark, path, queries, k = 4, nProbe = 1,
      rerankFrom = 16)
    pruned.collect()
    val plan = pruned.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*cell".r.findFirstIn(plan).isDefined,
      s"probe filter must land in PartitionFilters:\n$plan")
  }

  test("IvfIndex.rebuild: re-refined centroids restore fit after drifted " +
    "appends; parity preserved; rebuildIfStale fires only past threshold") {
    val d = 8
    def mk(id: Long, axis: Int): (Long, Array[Float]) =
      (id, Array.tabulate(d)(j => (if (j == axis) 1.0f else 0.0f) +
        0.05f * math.cos(id * 13 + j * 5).toFloat))
    val baseRows = (0L until 100L).map(mk(_, 0))
    val driftRows = (100L until 200L).map(mk(_, 4)) // orthogonal cluster
    val path = tmpDir("ivfrebuild")
    IvfIndex.build(baseRows.toDF("vec_id", "embedding"), path, nList = 4,
      refineIterations = 2)
    // freshly built: fit == baseline, no rebuild below any threshold
    assert(IvfIndex.rebuildIfStale(spark, path, nList = 4,
      maxDrift = 0.05).isEmpty)
    val st = IvfIndex.append(spark, path,
      driftRows.toDF("vec_id", "embedding"))
    assert(st.staleness > 0.1, s"drifted append staleness ${st.staleness}")
    val rb = IvfIndex.rebuildIfStale(spark, path, nList = 4,
      maxDrift = 0.05, refineIterations = 2)
    assert(rb.nonEmpty, "accumulated drift must trigger the rebuild")
    assert(rb.get.nRows === 200L)
    assert(rb.get.improvement > 0.05,
      s"rebuild must restore fit: ${rb.get.fitBefore} -> ${rb.get.fitAfter}")
    // exact-mode parity over the grown corpus through the NEW layout
    val corpus = (baseRows ++ driftRows).toDF("vec_id", "embedding")
    val queries = (baseRows.take(2) ++ driftRows.take(2))
      .toDF("query_id", "embedding")
    val exact = Similarity.bruteForceTopK(corpus, queries, k = 4)
    val viaIndex = IvfIndex.topK(spark, path, queries, k = 4, nProbe = 4)
    assert(viaIndex.exceptAll(exact).isEmpty
      && exact.exceptAll(viaIndex).isEmpty)
    // baseline refreshed: the rebuilt index reads as healthy again
    assert(IvfIndex.rebuildIfStale(spark, path, nList = 4,
      maxDrift = 0.05).isEmpty)
    // staging directory cleaned up after the swap
    assert(!new java.io.File(s"${path}__rebuild").exists())
  }

  test("IvfIndex.rebuild retrains PQ codebooks when the layout has them") {
    val vecs = (0 until 120).map { i =>
      (i.toLong, Array.tabulate(8)(j => math.cos(i * 13 + j * 5).toFloat))
    }
    val path = tmpDir("ivfrebuildpq")
    IvfIndex.build(vecs.take(60).toDF("vec_id", "embedding"), path,
      nList = 4, pqM = 4, pqK = 8)
    IvfIndex.append(spark, path, vecs.drop(60).toDF("vec_id", "embedding"))
    IvfIndex.rebuild(spark, path, nList = 4, refineIterations = 1)
    val codes = spark.read.parquet(s"$path/corpus")
      .select("vec_id", "codes").as[(Long, Seq[Int])].collect()
    assert(codes.length === 120)
    assert(codes.forall(_._2.length === 4), "rebuild dropped PQ codes")
    // ADC still serves off the rebuilt layout
    val queries = vecs.take(2).toDF("query_id", "embedding")
    val exact = Similarity.bruteForceTopK(vecs.toDF("vec_id", "embedding"),
      queries, k = 3)
    val viaAdc = IvfIndex.topKAdc(spark, path, queries, k = 3, nProbe = 4,
      rerankFrom = 120)
    assert(viaAdc.exceptAll(exact).isEmpty
      && exact.exceptAll(viaAdc).isEmpty)
  }

  test("LSH top-k returns a subset consistent with exact ranking") {
    val vecs = (0 until 40).map { i =>
      (i.toLong, Array.tabulate(16)(j =>
        (math.sin(i * 31 + j * 7) + (if (i % 2 == 0) 1.0 else -1.0)).toFloat))
    }
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = vecs.take(2).map { case (i, v) => (i, v) }
      .toDF("query_id", "embedding")
    val got = Similarity.lshTopK(corpus, queries, k = 3, bands = 16,
      bitsPerBand = 4).collect()
    assert(got.nonEmpty)
    assert(got.forall(_.getAs[Long]("rank") <= 3))
  }

  test("radiusSearch: exactly the pairs at or above the threshold, " +
    "self excluded, plan stays shuffle-free") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 1L)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val out = Similarity.radiusSearch(corpus, queries, threshold = 0.9)
    val got = out.as[(Long, Long, Double)].collect().toSet
    assert(got.map(_._2) === Set(2L)) // only the near-parallel vector
    assert(got.forall(_._3 >= 0.9))
    val plan = out.queryExecution.executedPlan
    assert(plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, s"radius search gained a shuffle:\n$plan")
    intercept[IllegalArgumentException](
      Similarity.radiusSearch(corpus, queries, threshold = 2.0))
  }

  test("ivfRadiusSearch: exact mode equals brute radius, probed mode is " +
    "a subset") {
    val rnd = new scala.util.Random(7)
    val corpus = (0L until 64L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2 - 1)))
      .toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") < 4)
      .select(col("vec_id").as("query_id"), col("embedding"))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "id").as[(Long, Long)].collect().toSet
    val brute = pairs(Similarity.radiusSearch(corpus, queries, 0.3))
    val exact = pairs(Similarity.ivfRadiusSearch(corpus, queries, 0.3,
      nList = 4, nProbe = 4))
    assert(exact === brute) // every cell probed -> brute equivalence
    val probed = pairs(Similarity.ivfRadiusSearch(corpus, queries, 0.3,
      nList = 4, nProbe = 2))
    assert(probed.subsetOf(brute)) // probing can only MISS, never invent
  }
}

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private def deg(a: Double) = math.toRadians(a)
  private def vec(angle: Double): Seq[Double] =
    Seq(math.cos(deg(angle)), math.sin(deg(angle)))

  // two centroids at 0° and 36.87°; the assignment bisector sits at ~18.4°
  private val cents = Seq((0, Seq(1.0, 0.0)), (1, Seq(0.8, 0.6)))
    .toDF("cid", "embedding")

  private def survivors(rows: Seq[(Long, Seq[Double])], tau: Double) =
    Dedup.semanticSurvivors(rows.toDF("vec_id", "embedding"), cents, tau)
      .as[(Long, Long)].collect().toMap

  test("pruning is CLUSTER-scoped: a near-identical pair split across " +
    "the assignment bisector survives on both sides") {
    // 17° and 20° straddle the bisector; cos(3°) = 0.9986 >= tau, but the
    // pair never meets in a cluster, so both survive — SemDeDup semantics
    val got = survivors(Seq(1L -> vec(17), 2L -> vec(20)), tau = 0.99)
    assert(got === Map(1L -> 0L, 2L -> 1L))
  }

  test("within a cluster the lower id dominates; assignment ties break " +
    "to the smaller cid") {
    val got = survivors(Seq(1L -> vec(17), 3L -> vec(18)), tau = 0.99)
    // cos(1°) = 0.99985: id 3 dominated by id 1 in cell 0
    assert(got === Map(1L -> 0L))
  }

  test("blanket dominance, not greedy-survivor chaining: a vector " +
    "dominated by an already-dominated earlier vector is still dropped") {
    // chain at 0°, 9°, 17° in cell 0 with tau between cos(9°) and cos(17°):
    // greedy chaining would keep 0° and 17° (the killer 9° is itself dead);
    // the blanket rule keeps only 0°
    val got = survivors(
      Seq(10L -> vec(0), 11L -> vec(9), 12L -> vec(17)), tau = 0.98)
    assert(got === Map(10L -> 0L))
  }

  test("far vectors in the same cluster all survive") {
    val got = survivors(Seq(1L -> vec(0), 2L -> vec(15)), tau = 0.99)
    assert(got === Map(1L -> 0L, 2L -> 0L))
  }

  test("auto path (k-means centroids): near-identical twins collapse, " +
    "well-separated groups keep one survivor each") {
    // two tight groups around 0° and 90° plus a near-twin in each; the
    // refined centroids land near the group means whatever the partition
    // order, so every twin shares its base's cluster
    val rows = Seq(
      1L -> vec(0), 2L -> vec(0.5),      // twins (cos ≈ 1)
      3L -> vec(5),                      // same group, far from 1 at tau
      11L -> vec(90), 12L -> vec(89.5),  // twins
      13L -> vec(85))
    val got = Dedup.semanticSurvivorsAuto(
      rows.toDF("vec_id", "embedding"), k = 2, tau = 0.99995)
      .as[(Long, Long)].collect().toMap
    assert(got.keySet === Set(1L, 3L, 11L, 13L),
      s"expected twins 2 and 12 pruned, got ${got.keySet}")
  }
}
