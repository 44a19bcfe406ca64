package graft.core

import org.apache.spark.sql.DataFrame

/** Lineage cuts for iterative / reused plans (connected components, LSH
  * staging frames). `localCheckpoint` is the fast default but stores blocks
  * only on executors — on a real cluster a lost executor kills the job.
  * Setting `spark.graft.checkpointDir` (e.g. an HDFS path) switches every
  * cut to a reliable checkpoint without touching call sites.
  */
object Checkpoints {

  val ConfKey = "spark.graft.checkpointDir"

  /** Materialize `df` and cut its lineage, reliably when [[ConfKey]] is
    * set, locally otherwise. */
  def cut(df: DataFrame): DataFrame = cut(df, eager = true)

  /** Lineage cut whose materialization rides the CALLER's next action
    * instead of an eager job of its own. NOTE: measured SLOWER than
    * [[cut]] for the connected-components loop (the next round reads the
    * frame through a self-union, and un-materialized blocks get computed
    * concurrently by both branches) — prefer [[cut]] unless the frame is
    * read exactly once. */
  def cutLazy(df: DataFrame): DataFrame = cut(df, eager = false)

  private def cut(df: DataFrame, eager: Boolean): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          spark.sparkContext.setCheckpointDir(dir)
        df.checkpoint(eager = eager)
      case None => df.localCheckpoint(eager = eager)
    }
  }
}
