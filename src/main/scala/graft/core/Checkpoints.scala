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
  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    spark.conf.getOption(ConfKey).filter(_.nonEmpty) match {
      case Some(dir) =>
        if (spark.sparkContext.getCheckpointDir.isEmpty)
          spark.sparkContext.setCheckpointDir(dir)
        df.checkpoint(eager = true)
      case None => df.localCheckpoint(eager = true)
    }
  }
}
