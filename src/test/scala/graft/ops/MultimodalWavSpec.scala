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

  test("wavEnergyWindows: windows partition the clip — per-window stats " +
    "fold back to parseWav's totals, tail window short") {
    val ids = (0L to 25L).toDF("doc_id")
    val rows = Multimodal.wavEnergyWindows(
        Multimodal.wavEncode(ids), windowFrames = 8)
      .as[(Long, Int, Int, Long, Long, Long)].collect()
      .groupBy(_._1)
    for (d <- 0L to 25L) {
      val (_, _, frames, peak, sumAbs, sumSq) = ref(d)
      val wins = rows(d).sortBy(_._2)
      // contiguous window ids, frame counts sum to the clip's frames,
      // tail short exactly when frames % 8 != 0
      assert(wins.map(_._2).toSeq == wins.indices.toSeq)
      assert(wins.map(_._3).sum == frames)
      assert(wins.init.forall(_._3 == 8) &&
        wins.last._3 == (if (frames % 8 == 0) 8 else frames % 8))
      // stats fold exactly to the whole-clip statistics
      assert(wins.map(_._4).max == peak, s"peak d=$d")
      assert(wins.map(_._5).sum == sumAbs, s"sum_abs d=$d")
      assert(wins.map(_._6).sum == sumSq, s"sum_sq d=$d")
    }
  }

  test("wavEnergyWindows: a spike is localized to ITS window only") {
    // hand-built mono clip: 16 frames of 100, frame 11 spiking to 30000
    def u32(v: Long) = Array[Byte]((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 24) & 0xff).toByte)
    def ascii(s: String) = s.getBytes("US-ASCII")
    val samples = Array.tabulate(16)(i => if (i == 11) 30000 else 100)
    val data = samples.flatMap(s =>
      Array[Byte]((s & 0xff).toByte, ((s >> 8) & 0xff).toByte))
    val blob = ascii("RIFF") ++ u32(4 + 24 + 8 + data.length) ++
      ascii("WAVE") ++ ascii("fmt ") ++ u32(16) ++
      Array[Byte](1, 0, 1, 0) ++ u32(8000) ++ u32(16000) ++
      Array[Byte](2, 0, 16, 0) ++ ascii("data") ++
      u32(data.length.toLong) ++ data
    val got = Multimodal.wavEnergyWindows(
        Seq((7L, blob)).toDF("doc_id", "content"), windowFrames = 8)
      .as[(Long, Int, Int, Long, Long, Long)].collect().sortBy(_._2)
    assert(got.length == 2)
    assert(got(0)._4 == 100L && got(1)._4 == 30000L)
    assert(got(0)._5 == 800L && got(1)._5 == 7 * 100L + 30000L)
  }

  test("wavEnergyWindows drops corrupt blobs (rejects stay the " +
    "decodeWavRejects surface) and rejects bad windowFrames") {
    val bad = Seq((1L, "nope".getBytes("US-ASCII"))).toDF("doc_id", "content")
    assert(Multimodal.wavEnergyWindows(bad, windowFrames = 4).count() == 0)
    intercept[IllegalArgumentException](
      Multimodal.wavEnergyWindows(bad, windowFrames = 0))
  }
}
