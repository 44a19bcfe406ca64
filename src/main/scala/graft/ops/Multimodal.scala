package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus the decode / feature-extract /
  * frame-sample plumbing a 100 TB training-data pipeline needs.
  *
  * Spark-side plumbing (schema, partition-preserving narrow ops, batched
  * `mapPartitions` signature) is real and tested. The image codec is REAL
  * for binary PPM (P6): [[decodePpm]] parses the public netpbm format —
  * magic, comments, whitespace-separated dimensions, maxval, raw RGB
  * planes — and emits per-channel pixel statistics. Formats whose
  * libraries are not in this container (JPEG/PNG/ffmpeg) keep the
  * deterministic byte-stat fallback in [[decodeFeatures]]; at cluster
  * scale only that body changes.
  */
object Multimodal {

  /** Attach a binary `content` column + mime metadata. In production this
    * column arrives from parquet as real image/audio bytes; here it is the
    * utf-8 payload of `textCol` (the driver corpus has no binary column). */
  def withBinaryContent(df: DataFrame, textCol: String = "text",
                        sourceCol: String = "source"): DataFrame =
    df.withColumn("content", encode(col(textCol), "utf-8"))
      .withColumn("mime",
        concat(lit("application/x-"), col(sourceCol)))

  /** Typed metadata extraction — pure codegen'd expressions over the
    * binary column (no decode needed): byte length, content digests, a
    * magic-byte format sniff. */
  def metadata(df: DataFrame, idCol: String = "doc_id"): DataFrame =
    df.select(col(idCol), col("mime"),
      length(col("content")).as("n_bytes"),
      md5(col("content")).as("content_md5"),
      sha2(col("content"), 256).as("content_sha256"),
      // magic-byte sniff (first byte class), the shape of a real
      // PNG/JPEG/RIFF dispatch
      when(substring(col("content"), 1, 1) === lit("t".getBytes), "t-class")
        .when(substring(col("content"), 1, 1) === lit("a".getBytes), "a-class")
        .otherwise("other").as("sniffed"))

  /** Frame sampling: split the payload into fixed-size chunks and emit at
    * most `maxFrames` of them with per-frame digests — the video
    * frame-extraction shape (narrow, partition-preserving, no shuffle). */
  def frameSample(df: DataFrame, frameBytes: Int, maxFrames: Int,
                  idCol: String = "doc_id"): DataFrame = {
    val nFrames = least(
      ceil(length(col("content")).cast("double") / frameBytes).cast("int"),
      lit(maxFrames))
    df.select(col(idCol), col("content"), nFrames.as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col(idCol),
        posexplode(transform(sequence(lit(0), col("n_frames") - 1),
          i => substring_binary_compat(col("content"), i * frameBytes + 1,
            frameBytes))).as(Seq("frame_idx", "frame")))
      .select(col(idCol), col("frame_idx"),
        length(col("frame")).as("frame_bytes"),
        md5(col("frame")).as("frame_md5"))
  }

  // substring() needs Int positions; for a Column start use expr-level slice
  private def substring_binary_compat(c: Column, start: Column,
                                      len: Int): Column =
    c.substr(start, lit(len))

  // public: Catalyst's generated encoder code cannot access private types
  final case class MmIn(doc_id: Long, content: Array[Byte])
  final case class MmFeat(doc_id: Long, features: Array[Double])

  /** Batched decode + feature extraction via `mapPartitions` — the Scala
    * analogue of `mapInPandas`: rows are processed in batches of
    * `batchSize` so a real codec can amortize per-call setup, and the
    * output schema is declared up front.
    *
    * Magic-byte dispatch, the shape of a real PNG/JPEG/RIFF codec mux:
    * a `P6` blob routes through the REAL netpbm parser ([[parsePpm]]) and
    * yields pixel-derived features [width, height, sum of all channel
    * samples, n_pixels]; anything else (formats whose libraries are not
    * in this container) falls back to the deterministic byte statistics
    * of [[decodeStub]] — [n_bytes, first_byte, last_byte, n_space_bytes].
    * A malformed P6 blob falls back rather than failing the batch. */
  def decodeFeatures(df: DataFrame, idCol: String = "doc_id",
                     batchSize: Int = 64): DataFrame = {
    val in = df.select(col(idCol).cast("long").as("doc_id"), col("content"))
      .as(Encoders.product[MmIn])
    val out = in.mapPartitions { iter =>
      iter.grouped(batchSize).flatMap { batch =>
        // a real implementation decodes the whole batch in one codec call
        batch.iterator.map { r =>
          val feats =
            if (isPpm(r.content))
              try {
                val (w, h, sr, sg, sb) = parsePpm(r.content)
                Array(w.toDouble, h.toDouble, (sr + sg + sb).toDouble,
                  (w.toLong * h).toDouble)
              } catch { case scala.util.control.NonFatal(_) =>
                // ANY decode failure falls back — at 100 TB a single
                // hostile blob must never kill the job
                decodeStub(r.content) }
            else decodeStub(r.content)
          MmFeat(r.doc_id, feats)
        }
      }
    }(Encoders.product[MmFeat])
    out.toDF()
  }

  /** P6 magic sniff: 'P', '6', then a whitespace byte (the only legal
    * third byte of a binary-PPM header). */
  private def isPpm(bytes: Array[Byte]): Boolean =
    bytes.length > 2 && bytes(0) == 'P' && bytes(1) == '6' &&
      (bytes(2) == ' ' || bytes(2) == '\n' || bytes(2) == '\r' ||
        bytes(2) == '\t' || bytes(2) == '#')

  final case class MmPpmStats(doc_id: Long, width: Int, height: Int,
                              sum_r: Long, sum_g: Long, sum_b: Long)

  /** Deterministic binary-PPM (P6) image per row — real netpbm bytes built
    * from `idCol` alone, so an independent oracle can recompute the
    * expected pixel statistics without ever seeing the blob: width =
    * 4 + id%5, height = 3 + id%4, channel c of pixel k =
    * (id*31 + k*7 + c*53) mod 256. The header includes a comment line, so
    * decoders must handle the full grammar, not just the happy path. */
  def ppmEncode(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val in = df.select(col(idCol).cast("long").as("doc_id"))
      .as(Encoders.scalaLong)
    in.mapPartitions { iter =>
      iter.map { d =>
        val w = 4 + (d % 5).toInt
        val h = 3 + (d % 4).toInt
        val header =
          s"P6\n# graft synthetic $d\n$w $h\n255\n".getBytes("US-ASCII")
        val px = new Array[Byte](w * h * 3)
        var k = 0
        while (k < w * h) {
          var c = 0
          while (c < 3) {
            px(k * 3 + c) = ((d * 31 + k * 7 + c * 53) % 256).toByte
            c += 1
          }
          k += 1
        }
        MmIn(d, header ++ px)
      }
    }(Encoders.product[MmIn]).toDF()
  }

  final case class MmPpmRow(doc_id: Long, ok: Boolean, width: Int,
                            height: Int, sum_r: Long, sum_g: Long,
                            sum_b: Long, reason: String)

  /** REAL codec: batched binary-PPM (P6) decode over the `content` column
    * — the same `mapPartitions` shape as [[decodeFeatures]], but the body
    * parses the actual public image format and the emitted statistics are
    * functions of the decoded pixels (width, height, per-channel sums).
    * Integer outputs by design: exact across engines, hash-stable.
    *
    * Malformed blobs do NOT fail the job (at 100 TB one corrupt object
    * would otherwise kill hours of work): each row decodes under try, and
    * failures become reject rows carrying a stable reason code — the same
    * try→side-output shape the G1 IntAct dispatch uses for unparseable
    * rows. [[decodePpm]] returns the decoded stats; [[decodePpmRejects]]
    * returns (doc_id, reason) for the corrupt rows. */
  private def decodePpmAll(df: DataFrame, idCol: String,
                           batchSize: Int): org.apache.spark.sql.Dataset[MmPpmRow] = {
    val in = df.select(col(idCol).cast("long").as("doc_id"), col("content"))
      .as(Encoders.product[MmIn])
    in.mapPartitions { iter =>
      iter.grouped(batchSize).flatMap { batch =>
        // one codec "session" per batch (where a real libjpeg/ffmpeg call
        // would amortize init); each row parses independently
        batch.iterator.map { r =>
          try {
            val (w, h, sr, sg, sb) = parsePpm(r.content)
            MmPpmRow(r.doc_id, ok = true, w, h, sr, sg, sb, null)
          } catch {
            case e: PpmException =>
              MmPpmRow(r.doc_id, ok = false, 0, 0, 0L, 0L, 0L, e.code)
            case _: RuntimeException =>
              MmPpmRow(r.doc_id, ok = false, 0, 0, 0L, 0L, 0L, "malformed")
          }
        }
      }
    }(Encoders.product[MmPpmRow])
  }

  def decodePpm(df: DataFrame, idCol: String = "doc_id",
                batchSize: Int = 64): DataFrame =
    decodePpmAll(df, idCol, batchSize)
      .filter(col("ok"))
      .select(col("doc_id"), col("width"), col("height"),
        col("sum_r"), col("sum_g"), col("sum_b"))

  /** The corrupt-blob side output of [[decodePpm]]: (doc_id, reason) with
    * reason ∈ {bad_magic, bad_dims, bad_maxval, truncated, malformed}. */
  def decodePpmRejects(df: DataFrame, idCol: String = "doc_id",
                       batchSize: Int = 64): DataFrame =
    decodePpmAll(df, idCol, batchSize)
      .filter(!col("ok"))
      .select(col("doc_id"), col("reason"))

  /** Decode failure with a STABLE reason code (an oracle can predict the
    * code; exception messages carry engine-specific detail). Extends
    * IllegalArgumentException so callers treating parse failure generically
    * keep working. */
  final class PpmException(val code: String, detail: String)
    extends IllegalArgumentException(s"$code: $detail")

  /** P6 parser: magic, `#` comments, whitespace-separated width / height /
    * maxval, ONE whitespace byte, then `w*h*3` raw bytes. Returns
    * (width, height, sumR, sumG, sumB). Throws [[PpmException]] on
    * malformed input — [[decodePpm]] routes those rows to the reject side
    * output instead of failing the job. */
  private[graft] def parsePpm(
      bytes: Array[Byte]): (Int, Int, Long, Long, Long) = {
    var i = 0
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0x0b
    def token(): String = {
      var scanning = true
      while (scanning) {
        while (i < bytes.length && isWs(bytes(i))) i += 1
        if (i < bytes.length && bytes(i) == '#')
          while (i < bytes.length && bytes(i) != '\n') i += 1
        else scanning = false
      }
      val s = i
      while (i < bytes.length && !isWs(bytes(i))) i += 1
      new String(bytes, s, i - s, "US-ASCII")
    }
    def fail(code: String, detail: String): Nothing =
      throw new PpmException(code, detail)
    def intToken(): Int = {
      val t = token()
      try t.toInt catch { case _: NumberFormatException =>
        fail("malformed", s"non-numeric header token '$t'") }
    }
    val magic = token()
    if (magic != "P6") fail("bad_magic", s"not a binary PPM (magic '$magic')")
    val w = intToken()
    val h = intToken()
    val maxval = intToken()
    if (w <= 0 || h <= 0) fail("bad_dims", s"bad dimensions ${w}x$h")
    if (maxval <= 0 || maxval >= 256)
      fail("bad_maxval", s"unsupported maxval $maxval (only 1-byte samples)")
    i += 1 // exactly one whitespace byte separates maxval from raster
    // LONG arithmetic: w*h*3 as Int overflows for hostile headers like
    // "P6 477218600 3" (wraps to a small positive that passes the check,
    // then the pixel loop walks off the array) or "P6 65536 65536"
    // (wraps to 0, "decoding" an empty raster as valid)
    val raster = w.toLong * h.toLong * 3L
    if ((bytes.length - i).toLong < raster)
      fail("truncated",
        s"truncated raster: need $raster bytes, have ${bytes.length - i}")
    var sr = 0L; var sg = 0L; var sb = 0L
    var k = 0
    while (k < w * h) {
      sr += bytes(i + k * 3) & 0xff
      sg += bytes(i + k * 3 + 1) & 0xff
      sb += bytes(i + k * 3 + 2) & 0xff
      k += 1
    }
    (w, h, sr, sg, sb)
  }

  /** STUB — deterministic fake decoder (no codec libs in the container). */
  private def decodeStub(bytes: Array[Byte]): Array[Double] = Array(
    bytes.length.toDouble,
    if (bytes.nonEmpty) (bytes.head & 0xff).toDouble else -1.0,
    if (bytes.nonEmpty) (bytes.last & 0xff).toDouble else -1.0,
    bytes.count(_ == ' '.toByte).toDouble)

  /** REAL image downscale for binary PPM: nearest-neighbor subsampling by
    * integer `factor` (keep pixels at even multiples of the factor in both
    * axes), re-encoded as a VALID P6 blob — so the output feeds straight
    * back into [[decodePpm]] / [[decodeFeatures]] / any P6 consumer, with
    * the source maxval preserved. Batched `mapPartitions`, same shape as
    * [[decodePpm]]. Corrupt inputs never kill the job: they are DROPPED
    * from this output, and a pipeline that must account for them runs
    * [[decodePpmRejects]] on the same frame — a row fails subsampling
    * exactly when it fails [[parsePpm]], so that IS this operator's
    * reject side.
    * Output: (doc_id, content) with dims ceil(w/factor) × ceil(h/factor). */
  def resizePpm(df: DataFrame, factor: Int, idCol: String = "doc_id",
                batchSize: Int = 64): DataFrame = {
    require(factor >= 1, s"need factor($factor) >= 1")
    val in = df.select(col(idCol).cast("long").as("doc_id"), col("content"))
      .as(Encoders.product[MmIn])
    in.mapPartitions { iter =>
      iter.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          try Some(MmIn(r.doc_id, subsamplePpm(r.content, factor)))
          catch { case _: IllegalArgumentException => None }
        }
      }
    }(Encoders.product[MmIn]).toDF()
  }

  /** Parse a P6 blob and re-encode every `factor`-th pixel (both axes).
    * The source MAXVAL is preserved: raw sample bytes are copied, so
    * re-labelling a maxval-100 image as 255 would silently rescale every
    * channel's meaning (100/100 full intensity becomes 100/255). */
  private def subsamplePpm(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val (w, h, maxval, rasterAt) = ppmHeader(bytes)
    val w2 = (w + factor - 1) / factor
    val h2 = (h + factor - 1) / factor
    val header = s"P6\n$w2 $h2\n$maxval\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w2 * h2 * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var oy = 0
    while (oy < h2) {
      var ox = 0
      while (ox < w2) {
        val src = rasterAt + ((oy * factor) * w + ox * factor) * 3
        val dst = header.length + (oy * w2 + ox) * 3
        out(dst) = bytes(src); out(dst + 1) = bytes(src + 1)
        out(dst + 2) = bytes(src + 2)
        ox += 1
      }
      oy += 1
    }
    out
  }

  /** Header-only P6 parse: (width, height, maxval, raster offset). Shares
    * the grammar and failure codes with [[parsePpm]]. */
  final case class MmDHash(doc_id: Long, ok: Boolean, dhash: Long,
                           reason: String)

  /** Perceptual difference-hash (dHash) through the REAL P6 decoder —
    * the image fingerprint behind image-dataset dedup (the visual twin
    * of SimHash for text): decode → integer luma → nearest-neighbor
    * sample onto a 9×8 grid → 64-bit horizontal-gradient hash (bit set
    * when a cell outshines its right neighbor). Gradients survive
    * re-encoding, mild resizing and brightness shifts, so near-duplicate
    * images land at small Hamming distance; all arithmetic is integer,
    * so the hash is deterministic across partitionings and runs.
    * Corrupt blobs land on the reject side (`ok = false`, stable reason
    * codes — the [[decodePpmRejects]] contract), never fail the job. */
  def dHashPpm(df: DataFrame, idCol: String = "doc_id",
               contentCol: String = "content"): DataFrame = {
    val in = df.select(col(idCol).cast("long").as("doc_id"),
      col(contentCol).as("content")).as(Encoders.product[MmIn])
    in.mapPartitions { iter =>
      iter.map { row =>
        try {
          val bytes = row.content
          val (w, h, _, off) = ppmHeader(bytes)
          def luma(x: Int, y: Int): Int = {
            val k = off + (y * w + x) * 3
            ((bytes(k) & 0xff) * 299 + (bytes(k + 1) & 0xff) * 587 +
              (bytes(k + 2) & 0xff) * 114) / 1000
          }
          var hash = 0L
          var y = 0
          while (y < 8) {
            val sy = y * h / 8
            var x = 0
            while (x < 8) {
              if (luma(x * w / 9, sy) > luma((x + 1) * w / 9, sy))
                hash |= 1L << (y * 8 + x)
              x += 1
            }
            y += 1
          }
          MmDHash(row.doc_id, ok = true, hash, "")
        } catch {
          case e: PpmException => MmDHash(row.doc_id, ok = false, 0L, e.code)
        }
      }
    }(Encoders.product[MmDHash]).toDF()
  }

  /** Image near-duplicate pairs: [[dHashPpm]] fingerprints through the
    * shared Hamming-band pigeonhole pairing
    * ([[Dedup.hammingPairs]]) — banded equi-join candidates, exact
    * XOR-bit-count verify, complete within the radius. Undecodable blobs
    * simply don't pair. Output: (id_a, id_b, hamming). */
  def imageNearDupPairs(df: DataFrame, maxHamming: Int = 3,
                        idCol: String = "doc_id",
                        contentCol: String = "content"): DataFrame =
    Dedup.hammingPairs(
      graft.core.Checkpoints.cut(
        dHashPpm(df, idCol, contentCol).filter(col("ok"))
          .select(col("doc_id").as("id"), col("dhash").as("fp"))),
      maxHamming)

  private def ppmHeader(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    // parsePpm validates the full blob (incl. raster length); re-walk the
    // header to find the raster offset
    parsePpm(bytes)
    var i = 0
    def isWs(b: Byte): Boolean =
      b == ' ' || b == '\n' || b == '\r' || b == '\t' || b == '\f' || b == 0x0b
    def token(): String = {
      var scanning = true
      while (scanning) {
        while (i < bytes.length && isWs(bytes(i))) i += 1
        if (i < bytes.length && bytes(i) == '#')
          while (i < bytes.length && bytes(i) != '\n') i += 1
        else scanning = false
      }
      val s = i
      while (i < bytes.length && !isWs(bytes(i))) i += 1
      new String(bytes, s, i - s, "US-ASCII")
    }
    token() // magic
    val w = token().toInt
    val h = token().toInt
    val maxval = token().toInt
    (w, h, maxval, i + 1)
  }

  /** "Resize" shape: recompute metadata after a transform — here a
    * truncation standing in for image downscale (narrow op). */
  def resizeStub(df: DataFrame, maxBytes: Int,
                 idCol: String = "doc_id"): DataFrame =
    metadata(
      df.withColumn("content", col("content").substr(lit(1), lit(maxBytes))),
      idCol)

  // --------------------------------------------------------------------------
  // REAL audio codec: RIFF/WAVE 16-bit PCM — the audio sibling of the PPM
  // image codec. Same posture: a public container format parsed for real
  // (RIFF chunk walk, fmt validation, interleaved little-endian samples),
  // deterministic synthetic fixtures an oracle can recompute without the
  // bytes, and corrupt blobs routed to a reject side output with stable
  // reason codes instead of failing the job.
  // --------------------------------------------------------------------------

  final case class MmWavRow(doc_id: Long, ok: Boolean, n_channels: Int,
                            sample_rate: Int, n_frames: Int, peak: Long,
                            sum_abs: Long, sum_sq: Long, reason: String)

  /** Deterministic RIFF/WAVE (16-bit PCM) clip per row — real WAV bytes
    * built from `idCol` alone, so an independent oracle can recompute
    * the expected sample statistics without ever seeing the blob:
    * channels = 1 + id%2, sample rate 8000 Hz, frames = 16 + id%9,
    * sample (frame k, channel c) = ((id·131 + k·17 + c·71) mod 65536) −
    * 32768, interleaved little-endian. A `LIST` chunk sits between
    * `fmt ` and `data`, so decoders must walk the chunk grammar, not
    * assume the happy-path 44-byte header. */
  def wavEncode(df: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val in = df.select(col(idCol).cast("long").as("doc_id"))
      .as(Encoders.scalaLong)
    in.mapPartitions { iter =>
      iter.map { d =>
        val ch = 1 + (d % 2).toInt
        val frames = 16 + (d % 9).toInt
        val rate = 8000
        val blockAlign = ch * 2
        val dataBytes = frames * blockAlign
        val listPayload = "INFO".getBytes("US-ASCII")
        val total = 12 + (8 + 16) + (8 + listPayload.length) +
          (8 + dataBytes)
        val out = new Array[Byte](total)
        var i = 0
        def ascii(s: String): Unit = {
          val b = s.getBytes("US-ASCII")
          System.arraycopy(b, 0, out, i, b.length); i += b.length
        }
        def u16(v: Int): Unit = {
          out(i) = (v & 0xff).toByte
          out(i + 1) = ((v >> 8) & 0xff).toByte
          i += 2
        }
        def u32(v: Long): Unit = {
          out(i) = (v & 0xff).toByte
          out(i + 1) = ((v >> 8) & 0xff).toByte
          out(i + 2) = ((v >> 16) & 0xff).toByte
          out(i + 3) = ((v >> 24) & 0xff).toByte
          i += 4
        }
        ascii("RIFF"); u32(total - 8L); ascii("WAVE")
        ascii("fmt "); u32(16L)
        u16(1); u16(ch); u32(rate.toLong); u32(rate.toLong * blockAlign)
        u16(blockAlign); u16(16)
        ascii("LIST"); u32(listPayload.length.toLong)
        System.arraycopy(listPayload, 0, out, i, listPayload.length)
        i += listPayload.length
        ascii("data"); u32(dataBytes.toLong)
        var k = 0
        while (k < frames) {
          var c = 0
          while (c < ch) {
            val s = ((d * 131 + k * 17 + c * 71) % 65536).toInt - 32768
            u16(s & 0xffff)
            c += 1
          }
          k += 1
        }
        MmIn(d, out)
      }
    }(Encoders.product[MmIn]).toDF()
  }

  /** Decode failure with a STABLE reason code — the WAV face of
    * [[PpmException]]. */
  final class WavException(val code: String, detail: String)
    extends IllegalArgumentException(s"$code: $detail")

  /** RIFF/WAVE 16-bit PCM parser: RIFF magic, chunk walk (unknown
    * chunks skipped, odd sizes padded per spec), `fmt ` validated
    * (PCM format 1, 16-bit, positive channels/rate) before `data`,
    * then `frames = data_size / block_align` interleaved little-endian
    * samples folded to EXACT integer statistics (peak = max |s|,
    * Σ|s|, Σs²). Throws [[WavException]] with code ∈ {bad_magic,
    * bad_fmt, truncated, malformed}; [[decodeWav]] routes those rows
    * to the reject side output instead of failing the job. All
    * offsets/sizes walk as Long — hostile 32-bit chunk sizes must not
    * wrap the cursor. */
  private[graft] def parseWav(
      bytes: Array[Byte]): (Int, Int, Int, Long, Long, Long) = {
    val (channels, rate, frames, off) = locateWavData(bytes)
    var peak = 0L; var sumAbs = 0L; var sumSq = 0L
    var j = off
    val end = off + frames * channels * 2
    while (j < end) {
      val s = ((bytes(j) & 0xff) | ((bytes(j + 1) & 0xff) << 8))
        .toShort.toLong
      val a = math.abs(s)
      if (a > peak) peak = a
      sumAbs += a
      sumSq += s * s
      j += 2
    }
    (channels, rate, frames, peak, sumAbs, sumSq)
  }

  /** [[parseWav]]'s stats folded PER WINDOW of `windowFrames` frames
    * (all channels of a frame belong to its window; the tail window may
    * be short) — the time-localized energy/peak profile a speech/music
    * curation pipeline thresholds on (silence trims, clipping scans).
    * Returns (channels, rate, frames, per-window (win, n_frames, peak,
    * Σ|s|, Σs²)). Same validation and exceptions as [[parseWav]] — one
    * chunk-grammar walk, shared via [[locateWavData]]. */
  private[graft] def parseWavWindows(bytes: Array[Byte], windowFrames: Int)
      : (Int, Int, Int, Array[(Int, Int, Long, Long, Long)]) = {
    require(windowFrames >= 1,
      s"windowFrames must be positive, got $windowFrames")
    val (channels, rate, frames, off) = locateWavData(bytes)
    val nWin = (frames + windowFrames - 1) / windowFrames
    val out = new Array[(Int, Int, Long, Long, Long)](nWin)
    var w = 0
    while (w < nWin) {
      val f0 = w * windowFrames
      val f1 = math.min(f0 + windowFrames, frames)
      var peak = 0L; var sumAbs = 0L; var sumSq = 0L
      var j = off + f0 * channels * 2
      val end = off + f1 * channels * 2
      while (j < end) {
        val s = ((bytes(j) & 0xff) | ((bytes(j + 1) & 0xff) << 8))
          .toShort.toLong
        val a = math.abs(s)
        if (a > peak) peak = a
        sumAbs += a
        sumSq += s * s
        j += 2
      }
      out(w) = (w, f1 - f0, peak, sumAbs, sumSq)
      w += 1
    }
    (channels, rate, frames, out)
  }

  /** The chunk-grammar walk shared by [[parseWav]] and
    * [[parseWavWindows]]: validates the container and returns
    * (channels, rate, frames, data offset) without touching samples. */
  private def locateWavData(bytes: Array[Byte]): (Int, Int, Int, Int) = {
    def fail(code: String, detail: String): Nothing =
      throw new WavException(code, detail)
    def u16(i: Int): Int = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8)
    def u32(i: Int): Long =
      (bytes(i) & 0xffL) | ((bytes(i + 1) & 0xffL) << 8) |
        ((bytes(i + 2) & 0xffL) << 16) | ((bytes(i + 3) & 0xffL) << 24)
    def ascii(i: Int): String =
      if (i + 4 <= bytes.length) new String(bytes, i, 4, "US-ASCII") else ""
    if (bytes.length < 12 || ascii(0) != "RIFF" || ascii(8) != "WAVE")
      fail("bad_magic", "not a RIFF/WAVE container")
    var pos = 12L
    var haveFmt = false
    var channels = 0
    var rate = 0
    while (pos + 8 <= bytes.length) {
      val id = ascii(pos.toInt)
      val size = u32(pos.toInt + 4)
      val body = pos + 8
      id match {
        case "fmt " =>
          if (size < 16 || body + 16 > bytes.length)
            fail("bad_fmt", s"fmt chunk too short ($size bytes)")
          val format = u16(body.toInt)
          channels = u16(body.toInt + 2)
          rate = u32(body.toInt + 4).toInt
          val bits = u16(body.toInt + 14)
          if (format != 1)
            fail("bad_fmt", s"not integer PCM (format $format)")
          if (bits != 16)
            fail("bad_fmt", s"only 16-bit samples supported, got $bits")
          if (channels <= 0 || rate <= 0)
            fail("bad_fmt", s"bad channels/rate $channels/$rate")
          haveFmt = true
        case "data" =>
          if (!haveFmt) fail("bad_fmt", "data chunk before fmt")
          if (body + size > bytes.length)
            fail("truncated", s"data chunk: need $size bytes, have " +
              s"${bytes.length - body}")
          val blockAlign = channels * 2
          if (size % blockAlign != 0)
            fail("malformed", s"data size $size not a multiple of the " +
              s"$blockAlign-byte frame")
          val frames = (size / blockAlign).toInt
          return (channels, rate, frames, body.toInt)
        case _ => // unknown chunk (LIST, fact, …): skip body + pad byte
      }
      pos = body + size + (size % 2) // RIFF pads chunks to even sizes
    }
    fail("malformed", "no data chunk")
  }

  private def decodeWavAll(df: DataFrame, idCol: String, batchSize: Int)
      : org.apache.spark.sql.Dataset[MmWavRow] = {
    val in = df.select(col(idCol).cast("long").as("doc_id"), col("content"))
      .as(Encoders.product[MmIn])
    in.mapPartitions { iter =>
      iter.grouped(batchSize).flatMap { batch =>
        // one codec "session" per batch, the decodePpmAll shape
        batch.iterator.map { r =>
          try {
            val (ch, rate, frames, peak, sumAbs, sumSq) = parseWav(r.content)
            MmWavRow(r.doc_id, ok = true, ch, rate, frames, peak, sumAbs,
              sumSq, null)
          } catch {
            case e: WavException =>
              MmWavRow(r.doc_id, ok = false, 0, 0, 0, 0L, 0L, 0L, e.code)
            case _: RuntimeException =>
              MmWavRow(r.doc_id, ok = false, 0, 0, 0, 0L, 0L, 0L,
                "malformed")
          }
        }
      }
    }(Encoders.product[MmWavRow])
  }

  /** Per-clip exact integer audio features over decoded PCM samples:
    * `(doc_id, n_channels, sample_rate, n_frames, peak, sum_abs,
    * sum_sq)` — peak/RMS inputs as exact integers (divide/sqrt
    * downstream if a float RMS is wanted; the stored form stays
    * engine-bit-exact). */
  def decodeWav(df: DataFrame, idCol: String = "doc_id",
                batchSize: Int = 64): DataFrame =
    decodeWavAll(df, idCol, batchSize)
      .filter(col("ok"))
      .select(col("doc_id"), col("n_channels"), col("sample_rate"),
        col("n_frames"), col("peak"), col("sum_abs"), col("sum_sq"))

  /** The corrupt-blob side output of [[decodeWav]]: (doc_id, reason)
    * with reason ∈ {bad_magic, bad_fmt, truncated, malformed}. */
  def decodeWavRejects(df: DataFrame, idCol: String = "doc_id",
                       batchSize: Int = 64): DataFrame =
    decodeWavAll(df, idCol, batchSize)
      .filter(!col("ok"))
      .select(col("doc_id"), col("reason"))

  final case class MmWavWinRow(doc_id: Long, win: Int, n_frames: Int,
                               peak: Long, sum_abs: Long, sum_sq: Long)

  /** Time-localized audio energy: [[decodeWav]]'s exact integer
    * statistics folded per window of `windowFrames` frames — the
    * silence-trim / clipping-scan feature a speech curation pipeline
    * thresholds on before transcription. Corrupt blobs are silently
    * absent here ([[decodeWavRejects]] is the accounting surface, the
    * decodeWav contract). Output: (doc_id, win, n_frames, peak,
    * sum_abs, sum_sq), the tail window short. */
  def wavEnergyWindows(df: DataFrame, windowFrames: Int,
                       idCol: String = "doc_id",
                       batchSize: Int = 64): DataFrame = {
    require(windowFrames >= 1,
      s"windowFrames must be positive, got $windowFrames")
    val in = df.select(col(idCol).cast("long").as("doc_id"), col("content"))
      .as(Encoders.product[MmIn])
    in.mapPartitions { iter =>
      iter.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          try {
            val (_, _, _, wins) = parseWavWindows(r.content, windowFrames)
            wins.iterator.map { case (w, nf, peak, sumAbs, sumSq) =>
              MmWavWinRow(r.doc_id, w, nf, peak, sumAbs, sumSq)
            }
          } catch {
            case _: WavException => Iterator.empty
            case _: RuntimeException => Iterator.empty
          }
        }
      }
    }(Encoders.product[MmWavWinRow]).toDF()
  }
}
