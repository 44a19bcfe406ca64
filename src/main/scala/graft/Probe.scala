package graft

import graft.core.{GraftSession, Tables}

/** Dev-only: print schemas of the test corpus (checks ns-timestamp read). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    spark.sparkContext.setLogLevel("ERROR")
    Tables.all.foreach { t =>
      try {
        val df = Tables.load(spark, "/root/testdata/sf0.001", t)
        println(s"== $t: ${df.schema.simpleString}")
        df.limit(1).collect()
        println(s"   $t read OK")
      } catch { case e: Throwable => println(s"   $t FAILED: ${e.getMessage.take(200)}") }
    }
    spark.stop()
  }
}
