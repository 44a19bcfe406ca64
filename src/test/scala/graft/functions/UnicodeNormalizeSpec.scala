package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.TextAnalysis

class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def normalize(s: String, form: String): String =
    Seq(Tuple1(s)).toDF("t")
      .select(TextAnalysis.normalizeUnicode(col("t"), form).as("n"))
      .collect()(0).getString(0)

  test("NFC composes decomposed accents; NFD decomposes them back") {
    val decomposed = "cafe\u0301"
    assert(normalize(decomposed, "NFC") === "caf\u00e9")
    assert(normalize("caf\u00e9", "NFD") === decomposed)
  }

  test("NFKC folds compatibility forms (fullwidth, ligature)") {
    // fullwidth digits and the fi ligature fold under NFKC, not NFC
    assert(normalize("\uFF11\uFF12\uFF13 \uFB01n", "NFKC") === "123 fin")
    assert(normalize("\uFF11\uFB01", "NFC") === "\uFF11\uFB01")
  }

  test("already-normalized ASCII passes through unchanged") {
    val s = "plain ascii stays identical"
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD"))
      assert(normalize(s, form) === s)
  }

  test("nulls propagate; matches java.text.Normalizer on mixed rows") {
    val rows = Seq("a\u0301b", "A\u030Angstrom", "x", null)
    val got = rows.toDF("t")
      .select(TextAnalysis.normalizeUnicode(col("t"), "NFKC").as("n"))
      .as[String].collect()
    val want = rows.map(s =>
      if (s == null) null else Normalizer.normalize(s, Normalizer.Form.NFKC))
    assert(got.toSeq === want)
  }

  test("survives rows wide enough to spill codegen paths consistently") {
    // many rows through whole-stage codegen; spot-check against Normalizer
    val rows = (0 until 500).map(i => s"row$i e\u0301 \uFF10$i")
    val got = rows.toDF("t")
      .select(TextAnalysis.normalizeUnicode(col("t"), "NFC").as("n"))
      .as[String].collect()
    assert(got.toSeq ===
      rows.map(Normalizer.normalize(_, Normalizer.Form.NFC)))
  }
}
