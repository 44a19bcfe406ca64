package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Test-corpus table access with explicit, code-declared schemas.
  *
  * Mirrors the reference's fixed per-module schema discipline (no schema
  * inference anywhere — bio2bel declares every model; see reference
  * abstract_manager.py:189-209). Parquet is self-describing so the declared
  * StructTypes are used for *validation*, not inference.
  */
object Tables {

  val region = StructType(Seq(
    StructField("r_regionkey", IntegerType),
    StructField("r_name", StringType)))

  val nation = StructType(Seq(
    StructField("n_nationkey", IntegerType),
    StructField("n_name", StringType),
    StructField("n_regionkey", IntegerType)))

  val customer = StructType(Seq(
    StructField("c_custkey", LongType),
    StructField("c_name", StringType),
    StructField("c_nationkey", IntegerType),
    StructField("c_acctbal", DoubleType),
    StructField("c_mktsegment", StringType)))

  val supplier = StructType(Seq(
    StructField("s_suppkey", LongType),
    StructField("s_name", StringType),
    StructField("s_nationkey", IntegerType),
    StructField("s_acctbal", DoubleType)))

  val part = StructType(Seq(
    StructField("p_partkey", LongType),
    StructField("p_name", StringType),
    StructField("p_brand", StringType),
    StructField("p_type", StringType),
    StructField("p_size", IntegerType),
    StructField("p_retailprice", DoubleType)))

  val orders = StructType(Seq(
    StructField("o_orderkey", LongType),
    StructField("o_custkey", LongType),
    StructField("o_orderstatus", StringType),
    StructField("o_totalprice", DoubleType),
    StructField("o_orderdate", TimestampNTZType),
    StructField("o_orderpriority", StringType)))

  val lineitem = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_partkey", LongType),
    StructField("l_suppkey", LongType),
    StructField("l_linenumber", IntegerType),
    StructField("l_quantity", DoubleType),
    StructField("l_extendedprice", DoubleType),
    StructField("l_discount", DoubleType),
    StructField("l_tax", DoubleType),
    StructField("l_returnflag", StringType),
    StructField("l_linestatus", StringType),
    StructField("l_shipdate", TimestampNTZType)))

  /** `ts` is declared TIMESTAMP_NTZ (microseconds) — the corpus encoding as
    * of 2026-08-13. Older corpora carried TIMESTAMP(NANOS), which Spark only
    * reads as long nanos under `spark.sql.legacy.parquet.nanosAsLong`; both
    * physical encodings are accepted and normalized by [[normalizeTs]]. */
  val events = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  val documents = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  val embeddings = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  val all: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  /** The non-streaming relational tables (events excluded — ts normalization). */
  val relational: Seq[String] = all.filterNot(_ == "events")

  private val declared: Map[String, StructType] = Map(
    "region" -> region, "nation" -> nation, "customer" -> customer,
    "supplier" -> supplier, "part" -> part, "orders" -> orders,
    "lineitem" -> lineitem, "events" -> events, "documents" -> documents,
    "embeddings" -> embeddings)

  /** Columns whose physical corpus encoding legitimately varies across
    * generator versions; validation accepts any listed type and
    * [[normalizeTs]] reconciles at load. `events.ts` has shipped as
    * TIMESTAMP(NANOS) (→ LongType under `nanosAsLong`), timestamp[us]
    * (→ TIMESTAMP_NTZ), and could arrive UTC-adjusted (→ TIMESTAMP). */
  private val alternates: Map[(String, String), Set[DataType]] = Map(
    ("events", "ts") -> Set(LongType, TimestampType, TimestampNTZType))

  /** Fail-fast schema validation: the declared StructTypes above are the
    * engine's contract with the corpus generator, and a silent drift in a
    * physical type is worse than a crash (a mis-typed long column can load
    * "successfully" and yield wrong answers — exactly what happened when
    * `events.ts` moved from ns-longs to µs-timestamps). Errors name the
    * table, the column, and both types. */
  def validateSchema(table: String, actual: StructType): Unit =
    declared.get(table).foreach { expected =>
      val got = actual.fields.map(f => f.name -> f.dataType).toMap
      expected.fields.foreach { f =>
        got.get(f.name) match {
          case None => throw new IllegalArgumentException(
            s"table '$table': declared column '${f.name}' (${f.dataType.sql}) " +
              s"is missing from the loaded schema ${actual.simpleString}")
          case Some(t) =>
            val ok = t == f.dataType ||
              alternates.get((table, f.name)).exists(_.contains(t))
            if (!ok) throw new IllegalArgumentException(
              s"table '$table', column '${f.name}': loaded type ${t.sql} " +
                s"does not match declared type ${f.dataType.sql}")
        }
      }
    }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    validateSchema(name, df.schema)
    df
  }

  /** Normalize a timestamp-carrying column to microsecond TIMESTAMP_NTZ
    * regardless of the physical encoding the corpus was generated with.
    * This is THE single conversion site — the µs-vs-ns bug class exists
    * precisely when this logic is duplicated and one copy rots:
    *  - LongType: legacy TIMESTAMP(NANOS) corpora read as raw nanos under
    *    `spark.sql.legacy.parquet.nanosAsLong`. Integer division (`div`),
    *    NOT `/`: epoch-ns (~1.8e18) exceeds a double's 53-bit mantissa,
    *    so `col / 1000` would round ~12% of rows off by 1µs.
    *  - TIMESTAMP_NTZ: already µs wall-clock — pass through.
    *  - TIMESTAMP: µs instant — wall-clock identical under the session's
    *    pinned UTC zone (GraftSession), cast through.
    * Anything else is a corpus drift this engine has never seen: fail with
    * the column and type rather than guess. */
  def normalizeTs(df: DataFrame, colName: String = "ts"): DataFrame = {
    import org.apache.spark.sql.functions._
    df.schema(colName).dataType match {
      case LongType =>
        df.withColumn(colName,
          timestamp_micros(expr(s"`$colName` div 1000")).cast(TimestampNTZType))
      case TimestampNTZType => df
      case TimestampType =>
        df.withColumn(colName, col(colName).cast(TimestampNTZType))
      case other => throw new IllegalArgumentException(
        s"column '$colName': cannot normalize ${other.sql} to a microsecond " +
          "timestamp — expected BIGINT (legacy ns), TIMESTAMP or TIMESTAMP_NTZ")
    }
  }

  /** Events with `ts` normalized to microsecond TIMESTAMP_NTZ (wall-clock
    * identical to the raw file, whatever its physical encoding). */
  def events(spark: SparkSession, dir: String): DataFrame =
    normalizeTs(load(spark, dir, "events"))
}
