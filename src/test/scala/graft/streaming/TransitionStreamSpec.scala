package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TransitionStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("streaming observations equal the batch lead-window pairs, " +
    "with in-batch disorder and multi-batch chains across the cut") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val types = Array("view", "click", "buy", "error")
    val rnd = new scala.util.Random(31)
    val rows = (1 to 240).map { i =>
      (i.toLong, ts(i * 60L), (i % 4).toLong, types(rnd.nextInt(4)))
    }
    val batchPairs = rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("to_type", lead("event_type", 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy("ts", "event_id")))
      .filter(col("to_type").isNotNull)
      .select(col("user_id"), col("event_type").as("from_type"),
        col("to_type"))
      .as[(Long, String, String)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap

    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val out = TransitionStream.transitionsStream(
      mem.toDS().toDF("event_id", "ts", "user_id", "event_type"))
    val q = out.writeStream.format("memory").queryName("trans_face")
      .outputMode("append").start()
    try {
      val (a, b) = rows.splitAt(120)
      // deliver each batch internally SHUFFLED — the seal sorts
      mem.addData(rnd.shuffle(a): _*); q.processAllAvailable()
      mem.addData(rnd.shuffle(b): _*); q.processAllAvailable()
      mem.addData((-1L, ts(10000000L), -1L, "x")); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("trans_face")
      .filter(col("user_id") =!= -1L)
      .select("user_id", "from_type", "to_type")
      .as[(Long, String, String)].collect()
      .groupBy(identity).view.mapValues(_.length).toMap
    assert(streamed == batchPairs)
  }

  test("a single-event key emits nothing; state clears after the seal") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val out = TransitionStream.transitionsStream(
      mem.toDS().toDF("event_id", "ts", "user_id", "event_type"))
    val q = out.writeStream.format("memory").queryName("trans_single")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(10), 5L, "view"))
      q.processAllAvailable()
      mem.addData((2L, ts(100000L), 9L, "x")) // advance the watermark
      q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("trans_single")
      .filter(col("user_id") === 5L).count() == 0)
  }
}
