package graft.ops

import graft.SparkSpec

class CosinePairsSpec extends SparkSpec {
  import spark.implicits._

  test("pairs, dots and norms match a brute-force count-vector cosine") {
    val vocab = Seq("alpha", "beta", "gamma", "delta", "eps")
    val rnd = new scala.util.Random(29)
    val docs = (1 to 40).map { i =>
      val words = (0 until 5 + rnd.nextInt(20))
        .map(_ => vocab(rnd.nextInt(vocab.size)))
      (i.toLong, words.mkString(" "))
    }
    val cap = 1000L // vocabulary this small: nothing pruned
    val vecs = docs.map { case (id, text) =>
      id -> text.split(" ").groupBy(identity).map { case (w, o) =>
        w -> o.length.toLong }
    }.toMap
    def dot(a: Map[String, Long], b: Map[String, Long]): Long =
      a.keySet.intersect(b.keySet).toSeq.map(w => a(w) * b(w)).sum
    def n2(a: Map[String, Long]): Long = a.values.map(v => v * v).sum
    val want = (for {
      (i, vi) <- vecs; (j, vj) <- vecs if i < j
      d = dot(vi, vj)
      if 4L * d * d >= 1L * n2(vi) * n2(vj) // threshold 1/2
    } yield ((i, j), (d, n2(vi), n2(vj)))).toMap
    val byName = TextSearch.cosinePairs(docs.toDF("doc_id", "text"),
      num = 1, den = 2, dfCap = cap)
      .select("d1", "d2", "dot", "n1sq", "n2sq")
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(byName === want)
  }

  test("the df cap defines the vector space: capped words drop from " +
    "dots AND norms") {
    val docs = Seq(
      (1L, "common rare1"), (2L, "common rare1"), (3L, "common rare2"))
      .toDF("doc_id", "text")
    // cap 2: 'common' (df 3) is pruned; docs 1,2 become identical
    // one-word vectors, doc 3 shares nothing with them
    val got = TextSearch.cosinePairs(docs, num = 9, den = 10, dfCap = 2)
      .select("d1", "d2", "dot", "n1sq", "n2sq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === Set((1L, 2L, 1L, 1L, 1L)))
  }

  test("ngram mode shingles the word stream; short docs vanish") {
    val docs = Seq(
      (1L, "a b c d"), // trigrams: "a b c", "b c d"
      (2L, "a b c x"), // trigrams: "a b c", "b c x" — shares 1 of 2
      (3L, "a b")) // shorter than the shingle: empty vector
      .toDF("doc_id", "text")
    val got = TextSearch.cosinePairs(docs, num = 1, den = 2, dfCap = 100,
      ngram = 3).select("d1", "d2", "dot", "n1sq", "n2sq")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got === Set((1L, 2L, 1L, 2L, 2L))) // cos = 1/2, inclusive
  }

  test("threshold is inclusive and exact at the rational boundary") {
    // identical docs: cosine exactly 1 — num/den = 1/1 keeps them
    val docs = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    assert(TextSearch.cosinePairs(docs, 1, 1, 100L).count() === 1)
    // orthogonal docs: cosine 0 — any positive threshold drops them
    val orth = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    assert(TextSearch.cosinePairs(orth, 1, 1000, 100L).count() === 0)
  }
}
