package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Face equality for the streaming funnel: the watermark-sealed chain
  * fold equals [[graft.ops.Funnel.perUserReach]] row-for-row — same
  * first-reach timestamps, same depths — under in-batch disorder, and
  * the conversion-lag statistics composed from the stream sink equal
  * [[graft.ops.Funnel.transitionLags]]. */
class FunnelStreamSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  private val stages = Seq("view", "click", "purchase")

  test("streaming reaches equal the batch face under in-batch disorder; " +
    "composed lags equal transitionLags") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val rnd = new scala.util.Random(41)
    val types = Seq("view", "click", "purchase", "noise")
    val rows = (1 to 400).map { i =>
      (i.toLong, ts(i * 37L % 9000), (i % 23).toLong,
        types(rnd.nextInt(types.size)))
    } :+ // same-timestamp pair on one key: tie-break must match batch
      (1001L, ts(50), 77L, "click") :+ (1002L, ts(50), 77L, "view")

    val batch = graft.ops.Funnel.perUserReach(
      rows.toDF("event_id", "ts", "user_id", "event_type"), stages)
      .select(col("user_id"), col("reach_ts"))
      .as[(Long, Seq[Option[java.sql.Timestamp]])].collect()
      .flatMap { case (u, arr) =>
        arr.zipWithIndex.collect { case (Some(t), i) =>
          (u, i + 1, AsOfStream.toUs(t))
        }
      }.toSet

    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val out = FunnelStream.reachStream(
      mem.toDS().toDF("event_id", "ts", "user_id", "event_type"), stages)
    val q = out.writeStream.format("memory").queryName("funnel_face")
      .outputMode("append").start()
    try {
      val cut = ts(4500)
      val (a, b) = rows.partition(_._2.before(cut))
      // in-batch disorder: each micro-batch arrives shuffled
      mem.addData(rnd.shuffle(a): _*); q.processAllAvailable()
      mem.addData(rnd.shuffle(b): _*); q.processAllAvailable()
      mem.addData((-1L, ts(10000000L), -1L, "view"))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("funnel_face")
      .filter(col("user_id") =!= -1L)
      .as[(Long, Int, Long)].collect().toSet
    assert(streamed == batch)

    // conversion-lag parity: the sink composes to transitionLags
    val lagsBatch = graft.ops.Funnel.transitionLags(
      rows.toDF("event_id", "ts", "user_id", "event_type"), stages)
      .as[(String, Long, Option[Long], Option[Long], Option[Long])]
      .collect().toSet
    val byUser = streamed.groupBy(_._1)
      .map { case (u, rs) => u -> rs.map(r => r._2 -> r._3).toMap }
    val lagsStream = (0 until stages.size - 1).map { i =>
      val lags = byUser.values.toSeq
        .filter(m => m.contains(i + 2))
        .map(m => m(i + 2) - m(i + 1))
      (s"${stages(i)}->${stages(i + 1)}", lags.size.toLong,
        if (lags.isEmpty) None else Some(lags.sum),
        if (lags.isEmpty) None else Some(lags.min),
        if (lags.isEmpty) None else Some(lags.max))
    }.toSet
    assert(lagsStream == lagsBatch)
  }

  test("a key that never advances and has nothing pending leaves no " +
    "state; a returning user's chain continues, never restarts") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String)]
    val out = FunnelStream.reachStream(
      mem.toDS().toDF("event_id", "ts", "user_id", "event_type"), stages)
    val q = out.writeStream.format("memory").queryName("funnel_cont")
      .outputMode("append").start()
    try {
      // u1 views at t=10; u2 only clicks (never stage 1 — no state kept)
      mem.addData((1L, ts(10), 1L, "view"), (2L, ts(11), 2L, "click"))
      q.processAllAvailable()
      mem.addData((3L, ts(5000), 1L, "click")) // seals the first batch
      q.processAllAvailable()
      mem.addData((-1L, ts(10000000L), -1L, "view"))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("funnel_cont")
      .filter(col("user_id") =!= -1L)
      .as[(Long, Int, Long)].collect().toSet
    // u1's chain CONTINUED across batches: view then click, two reaches
    assert(got == Set((1L, 1, 10000000L), (1L, 2, 5000000000L)))
  }
}
