package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.Temporal

/** The EWMA stream face must be BIT-equal to the batch fold on the
  * sealed prefix — same recurrence, same (ts, event_id) order. */
class EwmaStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming face equals the batch face bit-for-bit on a " +
    "multi-batch feed with late-but-admissible arrivals") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val rnd = new scala.util.Random(29)
    val rows = (1 to 240).map { i =>
      (i.toLong, new java.sql.Timestamp(i * 60000L), (i % 4).toLong,
        rnd.nextInt(500) / 7.0)
    }
    val batch = Temporal.ewma(
      rows.toDF("event_id", "ts", "user_id", "value"), alpha = 0.25)
      .select("event_id", "ewma", "ewvar")
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val out = EwmaStream.ewmaStream(
      mem.toDS().toDF("event_id", "ts", "user_id", "value"), alpha = 0.25)
    val q = out.writeStream.format("memory").queryName("ewma_face")
      .outputMode("append").start()
    try {
      // time-split halves (a below-watermark arrival is dropped by the
      // engine's own late-row filter, the documented stateful-operator
      // contract); WITHIN each batch the rows arrive id-shuffled, so
      // the operator must still fold in (ts, event_id) order
      val cut = rows.map(_._2.getTime).min +
        (rows.map(_._2.getTime).max - rows.map(_._2.getTime).min) / 2
      val (h1, h2) = rows.partition(_._2.getTime < cut)
      mem.addData(h1.sortBy(r => -r._1): _*); q.processAllAvailable()
      mem.addData(h2.sortBy(r => -r._1): _*); q.processAllAvailable()
      // far-future sentinel seals everything
      mem.addData((-1L, new java.sql.Timestamp(10L * 86400000L), -1L, 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ewma_face").filter(col("user_id") =!= -1L)
      .select("event_id", "ewma", "ewvar")
      .as[(Long, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.size == rows.size)
    rows.foreach { r =>
      assert(got(r._1) == batch(r._1), s"event ${r._1}") // BIT equality
    }
  }

  test("null and NaN values never reach state; sealed state is just " +
    "(m, v) — a key with no pending events keeps folding later batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val out = EwmaStream.ewmaStream(
      mem.toDS().toDF("event_id", "ts", "user_id", "value"), alpha = 0.25)
    val q = out.writeStream.format("memory").queryName("ewma_nulls")
      .outputMode("append").start()
    def ts(min: Long) = new java.sql.Timestamp(min * 60000L)
    try {
      mem.addData((1L, ts(1), 1L, 4.0), (2L, ts(2), 1L, Double.NaN))
      q.processAllAvailable()
      // sentinel advances the watermark to ts(190): seals events 1 and
      // 2; the NaN row must simply vanish
      mem.addData((90L, ts(200), 9L, 1.0))
      q.processAllAvailable()
      // later ABOVE-watermark event: key 1's sealed (m, v) must have
      // persisted across batches with no pending tail
      mem.addData((3L, ts(300), 1L, 8.0))
      q.processAllAvailable()
      mem.addData((91L, ts(20000), 9L, 1.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("ewma_nulls").filter(col("user_id") === 1L)
      .select("event_id", "ewma").as[(Long, Double)].collect().toMap
    assert(got == Map(1L -> 4.0, 3L -> (4.0 + 0.25 * 4.0)))
  }
}
