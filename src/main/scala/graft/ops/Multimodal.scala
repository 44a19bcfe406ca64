package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal-column operators: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus the decode / feature-extract /
  * frame-sample plumbing a 100 TB training-data pipeline needs.
  *
  * Spark-side plumbing (schema, partition-preserving narrow ops, batched
  * `mapPartitions` signature) is real and tested; the codec call itself is
  * a clearly-marked deterministic STUB — the image/audio libraries are not
  * in this container, and at cluster scale the stub body is the only line
  * that changes (swap in libjpeg/ffmpeg per-batch).
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
