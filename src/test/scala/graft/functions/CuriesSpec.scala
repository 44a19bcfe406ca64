package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** CURIE/pmid parser tests incl. ScalaCheck properties (SURVEY §5: the
  * off-by-one in reference biogrid.py:199-203 is the class of bug these
  * catch — prefix round-trips and null-safety). The scalatest-scalacheck
  * bridge isn't in the offline cache, so Gen is driven directly with
  * deterministic seeds. */
class CuriesSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic sample loop standing in for forAll. */
  private def forAll[A](g: Gen[A], n: Int = 40)(f: A => Unit): Unit =
    (1 to n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 40)
                           (f: (A, B) => Unit): Unit =
    forAll(Gen.zip(ga, gb), n) { case (a, b) => f(a, b) }

  private def eval1(input: String, c: org.apache.spark.sql.Column): Any = {
    val r = Seq(Option(input)).toDF("c").select(c.as("r")).collect().head
    if (r.isNullAt(0)) null else r.get(0)
  }

  test("F1: first pubmed token from pipe-list, with trim") {
    assert(eval1("imex:IM-123| pubmed:10748158 |doi:x",
      Curies.firstWithPrefix(col("c"), "pubmed:")) === "pubmed:10748158")
    assert(eval1("imex:IM-123|doi:x",
      Curies.firstWithPrefix(col("c"), "pubmed:")) === null)
  }

  test("F2: first miscore id strips the full prefix (no off-by-one)") {
    assert(eval1("intact-miscore:0.56",
      Curies.firstIdWithPrefix(col("c"), "intact-miscore:")) === "0.56")
  }

  test("prefix/identifier split on first colon only") {
    assert(eval1("chebi:CHEBI:15996", Curies.curiePrefix(col("c"))) === "chebi")
    assert(eval1("chebi:CHEBI:15996",
      Curies.curieIdentifier(col("c"))) === "CHEBI:15996")
    assert(eval1("nocolon", Curies.curiePrefix(col("c"))) === null)
    assert(eval1("nocolon", Curies.curieIdentifier(col("c"))) === null)
  }

  test("unquote strips surrounding quotes only") {
    assert(eval1("\"CHEBI:15996\"", Curies.unquote(col("c"))) === "CHEBI:15996")
    assert(eval1("a\"b", Curies.unquote(col("c"))) === "a\"b")
  }

  test("null input maps to null everywhere (null-safety)") {
    assert(eval1(null, Curies.curiePrefix(col("c"))) === null)
    assert(eval1(null, Curies.firstWithPrefix(col("c"), "x:")) === null)
    assert(eval1(null, Curies.normalizeWhitespace(col("c"))) === null)
    assert(eval1(null, Curies.stripPrefix(col("c"), "x")) === null)
  }

  test("property: stripPrefix(prefix+id) round-trips for safe ids") {
    val idGen = Gen.alphaNumStr.suchThat(_.nonEmpty)
    forAll(idGen) { id =>
      assert(eval1(s"pubmed:$id",
        Curies.stripPrefix(col("c"), "pubmed:")) === id)
    }
  }

  test("property: curiePrefix/curieIdentifier reassemble the CURIE") {
    val pre = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    val idG = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(':')))
      .map(_.mkString)
    forAll2(pre, idG) { (p, i) =>
      val curie = s"$p:$i"
      val gotP = eval1(curie, Curies.curiePrefix(col("c")))
      val gotI = eval1(curie, Curies.curieIdentifier(col("c")))
      assert(s"$gotP:$gotI" === curie)
    }
  }

  test("property: firstWithPrefix == the split/trim/startsWith composed " +
    "form it optimizes (ADVICE drift guard)") {
    // the reference semantics (intact.py:408-418): split on '|', trim
    // SPACES, first token starting with the prefix
    def reference(s: String, prefix: String): String =
      s.split("\\|", -1).iterator
        .map(t => t.dropWhile(_ == ' ').reverse.dropWhile(_ == ' ').reverse)
        .find(_.startsWith(prefix)).orNull
    val tokG = Gen.oneOf(
      Gen.alphaNumStr.map(x => s"pubmed:$x"),
      Gen.alphaNumStr.map(x => s"doi:$x"),
      Gen.alphaNumStr,
      Gen.const(" pubmed:space-led"),
      Gen.const("\tpubmed:tab-led"), // tab is NOT trimmed (space-only trim)
      Gen.const("pubmed: inner spaced "),
      Gen.const(""))
    forAll(Gen.nonEmptyListOf(tokG).map(_.mkString("|")), n = 120) { s =>
      assert(eval1(s, Curies.firstWithPrefix(col("c"), "pubmed:")) ===
        reference(s, "pubmed:"), s"input: '$s'")
    }
    // a prefix containing '|' can never match the token body — rejected
    intercept[IllegalArgumentException] {
      Curies.firstWithPrefix(col("c"), "a|b")
    }
  }

  test("F5: xrefList drops malformed members, keeps order") {
    val got = Seq("hgnc:5|plainword|uniprot:P1| chebi:X ")
      .toDF("c")
      .select(explode(Curies.xrefList(col("c"))).as("x"))
      .select("x.prefix", "x.identifier")
      .as[(String, String)].collect().toSeq
    assert(got === Seq(("hgnc", "5"), ("uniprot", "P1"), ("chebi", "X")))
  }

  test("F7: whitespace normalization collapses runs") {
    assert(eval1("a  b\t c", Curies.normalizeWhitespace(col("c"))) === "a b c")
  }

  test("F11: identifiers.org URL shape") {
    val got = Seq(("hgnc", "5")).toDF("p", "i")
      .select(Curies.identifiersOrgUrl(col("p"), col("i")).as("u"))
      .as[String].head()
    assert(got === "https://identifiers.org/hgnc:5")
  }
}
