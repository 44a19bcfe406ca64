package graft.core

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Append-only provenance log, the engine's equivalent of the reference's
  * Action table (reference models.py:40-134): every populate / failed
  * populate / drop of a source appends one `(resource, action, created)` row.
  *
  * Stored as a Parquet directory of appended part files — append-only by
  * construction, safe for concurrent sources (each populate writes its own
  * part file; no read-modify-write).
  */
final class ActionLog(spark: SparkSession, path: String) {
  import ActionLog._

  def append(resource: String, action: String): Unit = {
    import spark.implicits._
    val now = new Timestamp(System.currentTimeMillis())
    Seq((resource.toLowerCase, action, now))
      .toDF("resource", "action", "created")
      .write.mode(SaveMode.Append).parquet(path)
  }

  def storePopulate(resource: String): Unit = append(resource, Populate)
  def storePopulateFailed(resource: String): Unit = append(resource, PopulateFailed)
  def storeDrop(resource: String): Unit = append(resource, Drop)

  /** All actions, newest first (reference models.py:116-123, `Action.ls`). */
  def ls(): DataFrame =
    if (!Files.exists(Paths.get(path))) spark.emptyDataFrame
    else spark.read.parquet(path).orderBy(col("created").desc)

  /** Latest action for a resource — top-1 (reference models.py:8-17). */
  def last(resource: String): Option[(String, Timestamp)] =
    if (!Files.exists(Paths.get(path))) None
    else spark.read.parquet(path)
      .filter(lower(col("resource")) === resource.toLowerCase)
      .orderBy(col("created").desc).limit(1)
      .collect().headOption.map(r => (r.getString(1), r.getTimestamp(2)))

  def count(): Long =
    if (!Files.exists(Paths.get(path))) 0L else spark.read.parquet(path).count()
}

object ActionLog {
  val Populate = "populate"
  val PopulateFailed = "populate_failed"
  val Drop = "drop"
}

/** A registered data source — the engine's equivalent of the reference's
  * per-source Manager (reference abstract_manager.py:53-301). Owns a
  * namespace of tables under `warehouse/<module>/<table>` and the
  * populate / isPopulated / summarize / drop contract.
  */
trait Source {
  /** Lowercase module name; prefixes all table paths (reference
    * abstract_manager.py:166-175). */
  def moduleName: String

  /** Table names this source owns. */
  def tables: Seq[String]

  /** ETL: read raw inputs, conform, write every table (reference contract
    * abstract_manager.py:215-225). Implementations write with
    * `ctx.write(table, df)`. */
  def populate(ctx: SourceContext): Unit

  /** Default: populated iff every declared table exists and has ≥1 row
    * (reference abstract_manager.py:177-179 — `0 < _count_model`). */
  def isPopulated(ctx: SourceContext): Boolean =
    tables.forall(t => ctx.exists(t) && ctx.read(t).head(1).nonEmpty)

  /** name → row count per table (reference summarize contract). */
  def summarize(ctx: SourceContext): Map[String, Long] =
    tables.map(t => t -> (if (ctx.exists(t)) ctx.read(t).count() else 0L)).toMap
}

/** Per-source handle on the warehouse: path layout + provenance-wrapped
  * populate/drop (the reference wraps these via a metaclass,
  * abstract_manager.py:28-50; here it is a plain try/catch). */
final class SourceContext(val spark: SparkSession, warehouse: String, module: String) {
  private def tablePath(table: String) = s"$warehouse/$module/$table"

  val actions = new ActionLog(spark, s"$warehouse/_actions")

  def exists(table: String): Boolean = {
    val p = Paths.get(tablePath(table))
    Files.exists(p) && Files.list(p).findFirst().isPresent
  }

  def read(table: String): DataFrame = spark.read.parquet(tablePath(table))

  def write(table: String, df: DataFrame, mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(tablePath(table))

  /** Run `source.populate` with provenance: success appends `populate`,
    * failure appends `populate_failed` and rethrows (reference
    * models.py:70-113, connection_manager.py:87-94). */
  def populateWithProvenance(source: Source): Unit =
    try {
      source.populate(this)
      actions.storePopulate(source.moduleName)
    } catch {
      case e: Throwable =>
        actions.storePopulateFailed(source.moduleName)
        throw e
    }

  /** Drop all tables of a source; appends a `drop` action (reference
    * abstract_manager.py:240-247). */
  def drop(source: Source): Unit = {
    source.tables.foreach { t =>
      val p = Paths.get(tablePath(t))
      if (Files.exists(p)) {
        Files.walk(p).sorted(java.util.Comparator.reverseOrder())
          .forEach(f => Files.deleteIfExists(f))
      }
    }
    actions.storeDrop(source.moduleName)
  }
}

/** Explicit registry of sources (reference discovers via entry points,
  * utils.py:146-167; zero-egress engine registers explicitly). */
final class SourceRegistry {
  private var sources = Map.empty[String, Source]
  def register(s: Source): this.type = { sources += (s.moduleName -> s); this }
  def get(name: String): Option[Source] = sources.get(name)
  def names: Seq[String] = sources.keys.toSeq.sorted
  def all: Seq[Source] = names.flatMap(sources.get)
}
