package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Diagnostic main for the streaming gate family (r15, VERDICT item 5):
  * reproduces the w_stream_join / w_stream_join_outer / w_stream_ewma
  * harnesses and prints the per-micro-batch progress the memory-sink
  * gates discard — batch count, per-batch wall ms, state-store rows and
  * commit ms — so "machinery-bound" is a measured statement, not a
  * shrug. Diagnostic only: no query registered here, results discarded.
  */
object StreamDiag {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.GraftSession.local(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")

    def dump(name: String, q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
      val ps = q.recentProgress
      println(s"== $name: ${ps.length} micro-batches")
      ps.foreach { p =>
        val st = Option(p.stateOperators).map(_.toSeq).getOrElse(Nil)
        val stS = st.map(s => s"rows=${s.numRowsTotal} upd=${s.numRowsUpdated} " +
          s"commitMs=${s.commitTimeMs} mem=${s.memoryUsedBytes}").mkString(" | ")
        println(f"  batch=${p.batchId}%3d dur=${p.durationMs.getOrDefault("triggerExecution", -1L)}%6d ms " +
          s"addBatch=${p.durationMs.getOrDefault("addBatch", -1L)} " +
          s"getBatch=${p.durationMs.getOrDefault("getBatch", -1L)} " +
          s"walCommit=${p.durationMs.getOrDefault("walCommit", -1L)} " +
          s"stateCommit=[$stS] rowsIn=${p.numInputRows}")
      }
    }

    def joinGate(outer: Boolean): Unit = Round6Queries.withShufflePartitions(spark, 8) { ss =>
      import ss.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
      def feed(kind: String) = Round6Queries.eventsFeed(ss, sfDir)
        .filter(_._4 == kind).map(r => (r._1, r._2, r._3))
      val memL = MemoryStream[(Long, java.sql.Timestamp, Long)]
      val memR = MemoryStream[(Long, java.sql.Timestamp, Long)]
      val out = graft.streaming.EventStreams.intervalJoin(
        memL.toDS().toDF("event_id", "ts", "user_id"),
        memR.toDS().toDF("event_id", "ts", "user_id"),
        lookbackMinutes = 24 * 60,
        joinType = if (outer) "left_outer" else "inner")
      val sink = s"diag_join_$outer".replace("-", "_")
      ss.catalog.dropTempView(sink)
      val t0 = System.nanoTime()
      val q = out.writeStream.format("memory").queryName(sink)
        .outputMode("append").start()
      try {
        val clicks = feed("click"); val errors = feed("error")
        if (outer) {
          val maxTs = (clicks ++ errors).map(_._2.getTime).max
          val sentinel = (-1L, new java.sql.Timestamp(maxTs + 30L * 86400000L), -1L)
          memL.addData(clicks: _*); memR.addData(errors: _*)
          q.processAllAvailable()
          memL.addData(sentinel); memR.addData(sentinel)
          q.processAllAvailable()
        } else {
          val (l1, l2) = clicks.splitAt(clicks.length / 2)
          val (r1, r2) = errors.splitAt(errors.length / 2)
          memL.addData(l1: _*); memR.addData(r1: _*)
          q.processAllAvailable()
          memL.addData(l2: _*); memR.addData(r2: _*)
          q.processAllAvailable()
        }
        val n = ss.table(sink).count()
        println(f"gate wall: ${(System.nanoTime() - t0) / 1e9}%.2f s, rows=$n")
        dump(if (outer) "w_stream_join_outer" else "w_stream_join", q)
      } finally q.stop()
    }

    def ewmaGate(): Unit = Round6Queries.withShufflePartitions(spark, 8) { ss =>
      import ss.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = ss.sqlContext
      val rows = Round6Queries.eventsFeed(ss, sfDir)
        .filter(_._1 % 20 == 0)
        .map(r => (r._1, r._2, r._3, r._5))
      val mem = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
      val out = graft.streaming.EwmaStream.ewmaStream(
        mem.toDS().toDF("event_id", "ts", "user_id", "value"), alpha = 0.25)
      ss.catalog.dropTempView("diag_ewma")
      val t0 = System.nanoTime()
      val q = out.writeStream.format("memory").queryName("diag_ewma")
        .outputMode("append").start()
      try {
        val times = rows.map(_._2.getTime)
        val cut = times.min + (times.max - times.min) / 2
        mem.addData(rows.filter(_._2.getTime < cut): _*)
        q.processAllAvailable()
        mem.addData(rows.filter(_._2.getTime >= cut): _*)
        q.processAllAvailable()
        mem.addData((-1L, new java.sql.Timestamp(times.max + 30L * 86400000L), -1L, 0.0))
        q.processAllAvailable()
        val n = ss.table("diag_ewma").count()
        println(f"gate wall: ${(System.nanoTime() - t0) / 1e9}%.2f s, rows=$n")
        dump("w_stream_ewma", q)
      } finally q.stop()
    }

    val which = sys.env.getOrElse("SPARK_GRAFT_DIAG", "join,outer,ewma")
      .split(",").map(_.trim).toSet
    if (which("join")) joinGate(outer = false)
    if (which("outer")) joinGate(outer = true)
    if (which("ewma")) ewmaGate()
    spark.stop()
  }
}
