package graft.core

import java.time.LocalDateTime

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Schema-validation + ts-normalization contract. The µs-vs-ns drift of
  * 2026-08 loaded "successfully" under a force-declared LongType and
  * silently mis-scaled every window; these tests pin the fail-fast and
  * the one shared conversion site so that bug class cannot recur. */
class TablesSpec extends SparkSpec {
  import spark.implicits._

  test("load rejects a wrong-typed column, naming table, column and both types") {
    val dir = tmpDir("tables_drift")
    // events-shaped file with ts as STRING — an encoding the engine has
    // never shipped and must refuse, not coerce
    Seq((1L, "2024-01-01 00:00:00", 7L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException] {
      Tables.load(spark, dir, "events")
    }
    assert(e.getMessage.contains("events"))
    assert(e.getMessage.contains("'ts'"))
    assert(e.getMessage.contains("STRING"))
    assert(e.getMessage.contains("TIMESTAMP_NTZ"))
  }

  test("load rejects a missing declared column") {
    val dir = tmpDir("tables_missing")
    Seq((1L, 2L)).toDF("event_id", "user_id")
      .write.parquet(s"$dir/events.parquet")
    val e = intercept[IllegalArgumentException] {
      Tables.load(spark, dir, "events")
    }
    assert(e.getMessage.contains("'ts'"))
    assert(e.getMessage.contains("missing"))
  }

  test("normalizeTs: legacy long-nanos and timestamp[us] corpora load " +
    "wall-clock identical") {
    val us = 1700000000123456L // µs with a non-zero sub-millisecond part
    val legacy = Seq((1L, us * 1000L)).toDF("event_id", "ts") // raw nanos
    val modern = legacy.withColumn("ts",
      timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
    val a = Tables.normalizeTs(legacy).select("ts").as[LocalDateTime].head()
    val b = Tables.normalizeTs(modern).select("ts").as[LocalDateTime].head()
    assert(a === b)
    assert(Tables.normalizeTs(legacy).schema("ts").dataType === TimestampNTZType)
    // TIMESTAMP (with zone) casts through wall-clock identical under UTC
    val zoned = modern.withColumn("ts", col("ts").cast(TimestampType))
    val c = Tables.normalizeTs(zoned).select("ts").as[LocalDateTime].head()
    assert(c === a)
  }

  test("normalizeTs refuses an unknown encoding with the column and type") {
    val df = Seq((1L, "oops")).toDF("event_id", "ts")
    val e = intercept[IllegalArgumentException](Tables.normalizeTs(df))
    assert(e.getMessage.contains("'ts'"))
    assert(e.getMessage.contains("STRING"))
  }

  test("events loader on the real corpus yields TIMESTAMP_NTZ microseconds") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    assert(ev.schema("ts").dataType === TimestampNTZType)
    assert(ev.select(count(lit(1))).head().getLong(0) > 0)
  }
}
