package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class MultimodalWavSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference of the synthetic clip's exact statistics. */
  private def ref(d: Long): (Int, Int, Int, Long, Long, Long) = {
    val ch = 1 + (d % 2).toInt
    val frames = 16 + (d % 9).toInt
    var peak = 0L; var sumAbs = 0L; var sumSq = 0L
    for (k <- 0 until frames; c <- 0 until ch) {
      val s = ((d * 131 + k * 17 + c * 71) % 65536) - 32768
      val a = math.abs(s)
      if (a > peak) peak = a
      sumAbs += a; sumSq += s * s
    }
    (ch, 8000, frames, peak, sumAbs, sumSq)
  }

  test("wavEncode → decodeWav round-trip: real RIFF walk (LIST chunk " +
    "skipped), interleaved LE samples, exact integer statistics") {
    val ids = (0L to 25L).toDF("doc_id")
    val got = Multimodal.decodeWav(Multimodal.wavEncode(ids))
      .as[(Long, Int, Int, Int, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got.size === 26)
    for (d <- 0L to 25L) assert(got(d) === ref(d), s"doc $d")
  }

  test("corrupt blobs land on the reject side with stable reason " +
    "codes; clean rows never leak into it") {
    val blobs = Multimodal.wavEncode((0L to 20L).toDF("doc_id"))
    val corrupted = blobs.withColumn("content",
      when(col("doc_id") % 7 === 0, // magic overwritten
        concat(lit("X".getBytes("US-ASCII")),
          col("content").substr(lit(2), length(col("content")))))
        .when(col("doc_id") % 7 === 1, // raster tail lost
          col("content").substr(lit(1), length(col("content")) - 10))
        .when(col("doc_id") % 7 === 2, // fmt audioFormat patched to 3
          concat(col("content").substr(lit(1), lit(20)),
            lit(Array(3.toByte)),
            col("content").substr(lit(22),
              length(col("content")) - 21)))
        .otherwise(col("content")))
    val rejects = Multimodal.decodeWavRejects(corrupted)
      .as[(Long, String)].collect().toMap
    assert(rejects.keySet === (0L to 20L).filter(_ % 7 <= 2).toSet)
    rejects.foreach { case (d, reason) =>
      val want = (d % 7) match {
        case 0 => "bad_magic"
        case 1 => "truncated"
        case 2 => "bad_fmt"
      }
      assert(reason === want, s"doc $d")
    }
    // the ok side still decodes every clean row exactly
    val okIds = Multimodal.decodeWav(corrupted)
      .select("doc_id").as[Long].collect().toSet
    assert(okIds === (0L to 20L).filter(_ % 7 > 2).toSet)
  }

  test("parseWav grammar edges: data before fmt, ragged frame size, " +
    "missing data chunk, hostile chunk size") {
    def ascii(s: String) = s.getBytes("US-ASCII")
    def u32(v: Long) = Array[Byte]((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 24) & 0xff).toByte)
    val riff = ascii("RIFF") ++ u32(100) ++ ascii("WAVE")
    def code(b: Array[Byte]): String =
      intercept[Multimodal.WavException] { Multimodal.parseWav(b) }.code
    // data chunk before any fmt
    assert(code(riff ++ ascii("data") ++ u32(4) ++
      Array[Byte](0, 0, 0, 0)) === "bad_fmt")
    // no data chunk at all
    assert(code(riff) === "malformed")
    // hostile chunk size cannot wrap the cursor into a crash
    assert(code(riff ++ ascii("LIST") ++ u32(0xfffffff0L)) === "malformed")
    // ragged data size (not a frame multiple) on a valid stereo fmt
    val fmt = ascii("fmt ") ++ u32(16) ++
      Array[Byte](1, 0, 2, 0) ++ u32(8000) ++ u32(32000) ++
      Array[Byte](4, 0, 16, 0)
    assert(code(riff ++ fmt ++ ascii("data") ++ u32(6) ++
      new Array[Byte](6)) === "malformed")
  }
}
