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
    * STUB: the decode body is a deterministic fake (byte statistics) —
    * real deployments replace ONLY `decodeStub` with the codec call.
    * Features: [n_bytes, first_byte, last_byte, n_space_bytes]. */
  def decodeFeatures(df: DataFrame, idCol: String = "doc_id",
                     batchSize: Int = 64): DataFrame = {
    val spark = df.sparkSession
    val in = df.select(col(idCol).cast("long").as("doc_id"), col("content"))
      .as(Encoders.product[MmIn])
    val out = in.mapPartitions { iter =>
      iter.grouped(batchSize).flatMap { batch =>
        // a real implementation decodes the whole batch in one codec call
        batch.iterator.map(r => MmFeat(r.doc_id, decodeStub(r.content)))
      }
    }(Encoders.product[MmFeat])
    out.toDF()
  }

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

  /** REAL codec: batched binary-PPM (P6) decode over the `content` column
    * — the same `mapPartitions` shape as [[decodeFeatures]], but the body
    * parses the actual public image format and the emitted statistics are
    * functions of the decoded pixels (width, height, per-channel sums).
    * Integer outputs by design: exact across engines, hash-stable. */
  def decodePpm(df: DataFrame, idCol: String = "doc_id",
                batchSize: Int = 64): DataFrame = {
    val in = df.select(col(idCol).cast("long").as("doc_id"), col("content"))
      .as(Encoders.product[MmIn])
    in.mapPartitions { iter =>
      iter.grouped(batchSize).flatMap { batch =>
        // one codec "session" per batch (where a real libjpeg/ffmpeg call
        // would amortize init); each row parses independently
        batch.iterator.map { r =>
          val (w, h, sr, sg, sb) = parsePpm(r.content)
          MmPpmStats(r.doc_id, w, h, sr, sg, sb)
        }
      }
    }(Encoders.product[MmPpmStats]).toDF()
  }

  /** P6 parser: magic, `#` comments, whitespace-separated width / height /
    * maxval, ONE whitespace byte, then `w*h*3` raw bytes. Returns
    * (width, height, sumR, sumG, sumB). Throws on malformed input — at
    * scale, wrap the call site with a try→side-output if the corpus can
    * contain corrupt blobs. */
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
    val magic = token()
    require(magic == "P6", s"not a binary PPM (magic '$magic')")
    val w = token().toInt
    val h = token().toInt
    val maxval = token().toInt
    require(w > 0 && h > 0, s"bad dimensions ${w}x$h")
    require(maxval > 0 && maxval < 256,
      s"unsupported maxval $maxval (only 1-byte samples)")
    i += 1 // exactly one whitespace byte separates maxval from raster
    require(bytes.length - i >= w * h * 3,
      s"truncated raster: need ${w * h * 3} bytes, have ${bytes.length - i}")
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

  /** "Resize" shape: recompute metadata after a transform — here a
    * truncation standing in for image downscale (narrow op). */
  def resizeStub(df: DataFrame, maxBytes: Int,
                 idCol: String = "doc_id"): DataFrame =
    metadata(
      df.withColumn("content", col("content").substr(lit(1), lit(maxBytes))),
      idCol)
}
