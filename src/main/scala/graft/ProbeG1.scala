package graft

import org.apache.spark.sql.functions._

/** Dev probe: stage-by-stage timing of the G1 IntAct pipeline. */
object ProbeG1 {
  def main(args: Array[String]): Unit = {
    val d = "/root/testdata/sf0.1"
    val spark = graft.core.GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(s"PROBE $label rows=$n secs=${(System.nanoTime() - t0) / 1e9}")
    }
    val raw = Queries.intactSynthRaw(spark, d)
    val m = Queries.intactSynthMappings(spark, d)
    time("raw")(raw.count())
    val proc = graft.sources.Intact.processed(raw, m)
    time("processed")(proc.count())
    time("processed2")(proc.count())
    val (edges, rejects) = graft.sources.Intact.toBel(proc)
    time("edges_dedup")(edges.count())
    time("rejects")(rejects.count())
    val procCp = proc.localCheckpoint(true)
    val (edges2, _) = graft.sources.Intact.toBel(procCp)
    time("toBel_alone")(edges2.count())
    time("toBel_alone2")(edges2.count())
    spark.stop()
  }
}
