package graft.ops

import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("trainOnDict learns the canonical Sennrich merges") {
    // the ACL'16 example dict; es (9) -> est (9) -> est</w> (9) -> lo (7)
    val dict = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    val merges = Bpe.trainOnDict(dict, numMerges = 4)
    assert(merges === Seq("e" -> "s", "es" -> "t", "est" -> Bpe.Eow,
      "l" -> "o"))
  }

  test("training stops when no pair reaches minFrequency") {
    val merges = Bpe.trainOnDict(Seq(("ab", 1L), ("cd", 1L)), 10,
      minFrequency = 2)
    assert(merges === Seq.empty)
  }

  test("segmentWord reproduces training's segmentation of dict words") {
    val dict = Seq(("low", 5L), ("lower", 2L), ("newest", 6L),
      ("widest", 3L))
    val merges = Bpe.trainOnDict(dict, numMerges = 10)
    val ranks = merges.zipWithIndex.toMap
    // apply merges sequentially (training order) as the reference
    def trained(word: String): Seq[String] =
      merges.foldLeft(word.map(_.toString).toVector :+ Bpe.Eow) {
        (syms, m) =>
          val out = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == m._1 &&
              syms(i + 1) == m._2) { out += syms(i) + syms(i + 1); i += 2 }
            else { out += syms(i); i += 1 }
          }
          out.result()
      }
    for ((w, _) <- dict)
      assert(Bpe.segmentWord(w, ranks) === trained(w), s"word $w")
  }

  test("segmentation is a lossless round-trip for unseen words too") {
    val merges = Bpe.trainOnDict(Seq(("banana", 4L), ("bandana", 2L)), 6)
    val ranks = merges.zipWithIndex.toMap
    for (w <- Seq("banana", "bandanna", "nab", "zzz"))
      assert(Bpe.segmentWord(w, ranks).mkString === w + Bpe.Eow)
  }

  test("distributed tokenCounts equals per-word driver segmentation") {
    val docs = Seq((1L, "low low lower"), (2L, "newest widest newest"),
      (3L, "")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, numMerges = 5, minFrequency = 1)
    val got = Bpe.tokenCounts(docs, merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val ranks = merges.zipWithIndex.toMap
    def expect(text: String) = {
      val ws = text.split("\\s+").filter(_.nonEmpty)
      (ws.length.toLong,
        ws.map(w => Bpe.segmentWord(w, ranks).length.toLong).sum)
    }
    assert(got === Map(1L -> expect("low low lower"),
      2L -> expect("newest widest newest")))
    // empty doc has no words: absent from the per-word aggregation
    assert(!got.contains(3L))
  }

  test("encode emits ordered token streams that round-trip and count-match") {
    val docs = Seq((1L, "low low lower"), (2L, "Newest  widest newest"),
      (3L, "")).toDF("doc_id", "text")
    val merges = Bpe.train(docs, numMerges = 5, minFrequency = 1)
    val got = Bpe.encode(docs, merges).collect()
      .map(r => r.getLong(0) -> (r.getSeq[String](1), r.getLong(2))).toMap
    val counts = Bpe.tokenCounts(docs, merges).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    for ((id, norm) <- Seq(1L -> "low low lower",
        2L -> "newest widest newest")) {
      val (toks, n) = got(id)
      // round-trip: </w> → space reproduces the normalized text, and the
      // stream is ORDERED (a scrambled reassembly would not match)
      assert(toks.mkString.replace(Bpe.Eow, " ").trim === norm)
      assert(n === toks.length.toLong)
      assert(n === counts(id))
    }
    assert(!got.contains(3L)) // wordless doc: absent, like tokenCounts
  }

  test("encode order survives adversarial partitioning") {
    // many words per doc across partitions: collect_list order is
    // nondeterministic pre-sort, so this pins the pos-struct sort
    val text = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text)).toDF("doc_id", "text").repartition(5)
    val merges = Bpe.train(docs, numMerges = 3, minFrequency = 1)
    val toks = Bpe.encode(docs, merges).collect()(0).getSeq[String](1)
    assert(toks.mkString.replace(Bpe.Eow, " ").trim === text.toLowerCase)
  }

  test("training is partitioning-independent") {
    val docs = (1 to 50).map(i => (i.toLong, s"alpha beta gamma$i beta"))
      .toDF("doc_id", "text")
    val a = Bpe.train(docs, 8, minFrequency = 1)
    val b = Bpe.train(docs.repartition(7), 8, minFrequency = 1)
    assert(a === b)
  }
}
