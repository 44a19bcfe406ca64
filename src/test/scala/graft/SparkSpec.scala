package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (mirrors the reference's shared
  * temp-SQLite fixture machinery, testing.py:31-91 — one session, many
  * suites). Small core/partition counts keep the suite fast. */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = graft.core.GraftSession
      .configure(SparkSession.builder().master("local[4]"), shufflePartitions = 4)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SharedSpark.spark
  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
