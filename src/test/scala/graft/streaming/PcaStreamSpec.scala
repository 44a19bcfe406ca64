package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PcaStreamSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = (0L until 30L)
    .map(i => (i, Seq(0.1f * i, 0.5f - 0.02f * i, 1.0f)))
    .toDF("vec_id", "embedding")

  private def gramOf(df: org.apache.spark.sql.DataFrame) =
    graft.ops.Pca.gramExact(df).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
      .toMap

  test("per-batch deltas fold at read time to the one-shot gram, " +
    "bit-exactly") {
    val path = tmpDir("pca_stream") + "/idx"
    PcaStream.writeDelta(vecs.filter(col("vec_id") < 10), path, 0L)
    PcaStream.writeDelta(vecs.filter(col("vec_id") >= 10), path, 1L)
    val folded = PcaStream.readGram(spark, path).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(folded == gramOf(vecs))
  }

  test("a REPLAYED batch overwrites its own partition — no double count") {
    val path = tmpDir("pca_replay") + "/idx"
    PcaStream.writeDelta(vecs.filter(col("vec_id") < 10), path, 0L)
    PcaStream.writeDelta(vecs.filter(col("vec_id") >= 10), path, 1L)
    // crash-replay of batch 1: same id, same partition, same content
    PcaStream.writeDelta(vecs.filter(col("vec_id") >= 10), path, 1L)
    val folded = PcaStream.readGram(spark, path).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(folded == gramOf(vecs))
    // and the other batch's partition stayed untouched
    assert(spark.read.parquet(path)
      .select("batch_id").distinct().count() == 2)
  }

  test("the streaming face lands every micro-batch exactly once") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val path = tmpDir("pca_live") + "/idx"
    val rows = vecs.as[(Long, Seq[Float])].collect().toSeq
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = PcaStream.maintainGram(
      mem.toDS().toDF("vec_id", "embedding"), path)
    try {
      mem.addData(rows.take(15): _*); q.processAllAvailable()
      mem.addData(rows.drop(15): _*); q.processAllAvailable()
    } finally q.stop()
    val folded = PcaStream.readGram(spark, path).collect()
      .map(r => ((r.getInt(0), r.getInt(1)), (r.getLong(2), r.getLong(3))))
      .toMap
    assert(folded == gramOf(vecs))
  }
}
