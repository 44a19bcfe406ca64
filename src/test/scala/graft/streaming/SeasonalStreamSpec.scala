package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ops.{Anomaly, Temporal}

class SeasonalStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, String, String, Double)*) =
    rows.map(r => (r._1, java.sql.Timestamp.valueOf(r._2), r._3, r._4))
      .toDF("event_id", "ts", "event_type", "value")

  test("per-batch moment deltas fold at read time to the one-shot " +
    "profile; a REPLAYED batch overwrites its own partition") {
    val all = (0 until 20).map(i =>
      (i.toLong, f"2024-03-${10 + i % 5}%02d ${i % 3 * 7}%02d:15:00",
        if (i % 2 == 0) "a" else "b", 3.0 + i))
    val (b0, b1) = all.partition(_._1 % 2 == 0)
    val path = tmpDir("seasonal_stream") + "/p"
    SeasonalStream.writeDelta(ev(b0: _*), path, 0L)
    SeasonalStream.writeDelta(ev(b1: _*), path, 1L)
    val folded = SeasonalStream.readProfile(spark, path)
      .as[(String, Int, Long, Long, Long)].collect().toSet
    val oneShot = Temporal.seasonalProfile(ev(all: _*))
      .as[(String, Int, Long, Long, Long)].collect().toSet
    assert(folded == oneShot)
    // replay: same batch id, same partition, dynamic overwrite
    SeasonalStream.writeDelta(ev(b1: _*), path, 1L)
    val replayed = SeasonalStream.readProfile(spark, path)
      .as[(String, Int, Long, Long, Long)].collect().toSet
    assert(replayed == oneShot)
  }

  test("scoreStream IS the batch column logic — identical flags on a " +
    "static frame") {
    val rows = (0 until 30).map(i =>
      (i.toLong, "2024-03-10 03:00:00", "a",
        if (i == 29) 500.0 else 5.0 + 0.1 * (i % 4)))
    val frame = ev(rows: _*)
    val prof = Temporal.seasonalProfile(frame)
    val viaStream = SeasonalStream.scoreStream(frame, prof)
      .select("event_id", "is_outlier").as[(Long, Boolean)]
      .collect().toSet
    val viaBatch = Anomaly.flagSeasonal(frame, prof)
      .select("event_id", "is_outlier").as[(Long, Boolean)]
      .collect().toSet
    assert(viaStream == viaBatch)
    assert(viaStream.contains((29L, true)))
  }

  test("the scoring plan is STATELESS on a real stream: broadcast " +
    "stream-static join, no state store operator") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val hist = (0 until 12).map(i =>
      (i.toLong, "2024-03-10 03:00:00", "a", 5.0))
    val prof = Temporal.seasonalProfile(ev(hist: _*))
    val mem = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val out = SeasonalStream.scoreStream(
      mem.toDS().toDF("event_id", "ts", "event_type", "value"), prof)
    spark.catalog.dropTempView("seasonal_stateless")
    val q = out.writeStream.format("memory")
      .queryName("seasonal_stateless").outputMode("append").start()
    try {
      mem.addData((100L,
        java.sql.Timestamp.valueOf("2024-03-11 03:00:00"), "a", 50.0))
      q.processAllAvailable()
      mem.addData((101L,
        java.sql.Timestamp.valueOf("2024-03-11 03:00:00"), "a", 5.0))
      q.processAllAvailable()
      val got = spark.table("seasonal_stateless")
        .select("event_id", "is_outlier").as[(Long, Boolean)]
        .collect().toMap
      assert(got == Map(100L -> true, 101L -> false))
      val plan = q.asInstanceOf[org.apache.spark.sql.execution
          .streaming.runtime.StreamingQueryWrapper]
        .streamingQuery.lastExecution.executedPlan
      val planStr = plan.toString
      assert(!planStr.contains("StateStore") &&
        !planStr.contains("FlatMapGroupsWithState"),
        s"seasonal scoring must be stateless:\n$plan")
      assert(planStr.contains("BroadcastHashJoin"),
        s"profile must join broadcast:\n$plan")
    } finally q.stop()
  }
}
