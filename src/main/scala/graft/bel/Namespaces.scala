package graft.bel

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Namespace manager (reference manager/namespace_manager.py:242-445):
  * make / incremental-update / export of BEL namespaces.
  *
  * Store layout: two parquet tables under `path` —
  *   namespaces(url, name, keyword, version)           (url is the key)
  *   namespace_entries(namespace_url, identifier, name, encoding)
  *
  * Determinism: the reference hashes entries in ORM iteration order
  * (utils.py:189-199); a distributed engine has no such order, so the
  * content hash is defined over entries sorted by key (SURVEY §7.5) —
  * stable across partitionings and engines.
  */
final case class NamespaceSpec(moduleName: String, name: String,
                               keyword: String, url: String,
                               hasNames: Boolean = true)

object NamespaceSpec {
  /** Reference defaults (namespace_manager.py:213-225): name/keyword/url
    * fall back to module-name derivatives. */
  def forModule(moduleName: String): NamespaceSpec =
    NamespaceSpec(moduleName, moduleName, moduleName.toUpperCase,
      s"_${moduleName.toUpperCase}")
}

final class NamespaceStore(spark: SparkSession, path: String,
                           clock: () => String = () =>
                             java.time.Instant.now().toString) {
  import spark.implicits._

  private val nsPath = s"$path/namespaces"
  private val entryPath = s"$path/namespace_entries"

  private def exists(p: String): Boolean = {
    val hp = new HPath(p)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(hp) && fs.listStatus(hp).nonEmpty
  }

  def namespaces: DataFrame =
    if (exists(nsPath)) spark.read.parquet(nsPath)
    else Seq.empty[(String, String, String, String)]
      .toDF("url", "name", "keyword", "version")

  def entries(url: String): DataFrame =
    if (exists(entryPath))
      spark.read.parquet(entryPath).filter(col("namespace_url") === url)
    else Seq.empty[(String, String, String, String)]
      .toDF("namespace_url", "identifier", "name", "encoding")

  /** The default namespace for a spec — one-or-none on url
    * (namespace_manager.py:228-230). */
  def get(spec: NamespaceSpec): Option[(String, String)] = {
    val rows = namespaces.filter(col("url") === spec.url).limit(2).collect()
    require(rows.length <= 1, s"multiple namespaces for url=${spec.url}")
    rows.headOption.map(r =>
      (r.getAs[String]("url"), r.getAs[String]("version")))
  }

  /** K12 make (namespace_manager.py:242-260): insert the namespace row and
    * all entries. `models` columns: (identifier, name, encoding). */
  private def make(spec: NamespaceSpec, models: DataFrame): Unit = {
    Seq((spec.url, spec.name, spec.keyword, clock()))
      .toDF("url", "name", "keyword", "version")
      .write.mode(SaveMode.Append).parquet(nsPath)
    models
      .filter(col("identifier").isNotNull)
      .select(lit(spec.url).as("namespace_url"), col("identifier"),
        col("name"), col("encoding"))
      .write.mode(SaveMode.Append).parquet(entryPath)
  }

  /** A7 incremental update (namespace_manager.py:272-296): anti-join on
    * identifier, skip entries with null names; returns (new, skipped). */
  private def update(spec: NamespaceSpec, models: DataFrame): (Long, Long) = {
    val existing = entries(spec.url).select(col("identifier"))
    // persisted: the un-cached form evaluated the anti-join (one full
    // models pass + entry-table scan) THREE times — skipped count, added
    // count, append write; both counts now fold into ONE conditional
    // aggregation over the cached frame (r14)
    val fresh = models.join(existing, Seq("identifier"), "left_anti")
      .persist()
    try {
      val r = fresh.agg(
        count(when(col("name").isNotNull, 1)).as("added"),
        count(when(col("name").isNull, 1)).as("skipped")).head
      fresh.filter(col("name").isNotNull)
        .select(lit(spec.url).as("namespace_url"), col("identifier"),
          col("name"), col("encoding"))
        .write.mode(SaveMode.Append).parquet(entryPath)
      (r.getLong(0), r.getLong(1))
    } finally { fresh.unpersist(); () }
  }

  /** upload_bel_namespace (namespace_manager.py:315-332). */
  def upload(spec: NamespaceSpec, models: DataFrame,
             doUpdate: Boolean = false): Unit =
    get(spec) match {
      case None => make(spec, models)
      case Some(_) => if (doUpdate) { update(spec, models); () }
    }

  /** drop_bel_namespace (namespace_manager.py:334-345). Parquet is
    * immutable, so drop = rewrite-without: filter the dropped url out into
    * a tmp path, then swap directories. Fully distributed — no
    * collect-to-driver, so the same code path works when the entry table
    * outgrows the "dictionary-sized" contract. */
  def drop(spec: NamespaceSpec): Unit = {
    def rewriteWithout(path: String, keyCol: String): Unit = {
      if (!exists(path)) return
      val tmp = s"$path.__drop_tmp"
      spark.read.parquet(path)
        .filter(col(keyCol) =!= spec.url)
        .write.mode(SaveMode.Overwrite).parquet(tmp)
      // Swap via rename-aside, never delete-then-rename: a crash between a
      // delete and the rename (or a silently failed rename) must not leave
      // the only copy of the table in tmp. Each rename's boolean result is
      // checked — HDFS-style FileSystems signal failure by returning false.
      val hp = new HPath(path)
      val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val old = new HPath(s"$path.__old")
      if (fs.exists(old)) fs.delete(old, true)
      require(fs.rename(hp, old), s"drop: failed to move $path aside")
      if (!fs.rename(new HPath(tmp), hp)) {
        fs.rename(old, hp) // restore the live table before failing
        throw new IllegalStateException(s"drop: failed to move $tmp -> $path")
      }
      fs.delete(old, true)
      ()
    }
    rewriteWithout(entryPath, "namespace_url")
    rewriteWithout(nsPath, "url")
  }

  /** A14 (utils.py:189-199): md5 over ordered `name:encoding` (or
    * `identifier:encoding`) pairs. Ordered = sorted by the key column.
    * Driver-side by the dictionary-size contract; for tables that outgrow
    * it, [[contentFingerprint64]] is the distributed path. */
  def namespaceHash(models: DataFrame, useNames: Boolean = true): String = {
    val key = if (useNames) "name" else "identifier"
    val parts = models
      .filter(col(key).isNotNull)
      .select(concat(col(key), lit(":"), col("encoding")).as("kv"))
      .orderBy("kv")
      .as[String].collect()
    val md = MessageDigest.getInstance("MD5")
    parts.foreach(p => md.update(p.getBytes(StandardCharsets.UTF_8)))
    md.digest().map("%02x".format(_)).mkString
  }

  /** The 100 TB form of the A14 change-detection hash: an ORDER-FREE
    * content fingerprint — count + commutative sum of per-entry xxhash64 —
    * computed in ONE distributed aggregation with no sort and no
    * collect-to-driver. Not byte-compatible with the reference's md5 (the
    * md5 stays for sidecar parity at dictionary scale), but it has the
    * same contract: equal multisets of `key:encoding` pairs ⇔ equal
    * fingerprints (up to a ~2⁻⁶⁴ collision), so skip-if-unchanged export
    * guards work unmodified against tables of any size. */
  def contentFingerprint64(models: DataFrame,
                           useNames: Boolean = true): (Long, Long) = {
    val key = if (useNames) "name" else "identifier"
    val r = models
      .filter(col(key).isNotNull)
      .agg(count(lit(1)),
        sum(xxhash64(concat(col(key), lit(":"), col("encoding")))))
      .collect().head
    (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
  }
}

/** File exports: .belns / annotation / mapping JSON / md5-guarded
  * directory (K3-K6, namespace_manager.py:347-445). Namespaces are
  * dictionary-sized by contract, so the files are written driver-side. */
object NamespaceFiles {

  /** K3 (write_namespace): `[Namespace]` header + `key|encoding` lines. */
  def belns(spec: NamespaceSpec, models: DataFrame,
            useNames: Boolean): String = {
    val key = if (useNames) "name" else "identifier"
    val values = models
      .filter(col(key).isNotNull)
      .select(concat(col(key), lit("|"), col("encoding")).as("line"))
      .orderBy("line")
      .collect().map(_.getString(0))
    val header = Seq(
      "[Namespace]",
      s"Keyword=${spec.keyword}",
      s"NameString=${spec.name}",
      s"QueryValueURL=${spec.url}",
      "",
      "[Values]")
    (header ++ values).mkString("", "\n", "\n")
  }

  /** K4 (write_annotation): same shape with `[AnnotationDefinition]`. */
  def annotation(spec: NamespaceSpec, models: DataFrame): String = {
    val values = models
      .filter(col("name").isNotNull)
      .select(concat(col("name"), lit("|"), col("encoding")).as("line"))
      .orderBy("line")
      .collect().map(_.getString(0))
    val header = Seq(
      "[AnnotationDefinition]",
      s"Keyword=${spec.keyword}",
      s"DescriptionString=${spec.name}",
      "",
      "[Values]")
    (header ++ values).mkString("", "\n", "\n")
  }

  /** K5 (write_bel_namespace_mappings): identifier→name JSON, sorted. */
  def mappingJson(models: DataFrame): String = {
    val pairs = models
      .filter(col("identifier").isNotNull && col("name").isNotNull)
      .select("identifier", "name")
      .orderBy("identifier")
      .collect()
      .map(r => s"""  "${r.getString(0)}": "${r.getString(1)}"""")
    pairs.mkString("{\n", ",\n", "\n}")
  }

  /** K6 (write_directory, :388-415): md5-sidecar-guarded export. Returns
    * false when content is unchanged (skip), true when (re)written. */
  def writeDirectory(store: NamespaceStore, spec: NamespaceSpec,
                     models: DataFrame, directory: String): Boolean = {
    import java.nio.file.{Files, Paths}
    Files.createDirectories(Paths.get(directory))
    val hashPath = Paths.get(directory, s"${spec.moduleName}.belns.md5")
    val current = store.namespaceHash(models, useNames = spec.hasNames)
    val old = if (Files.exists(hashPath))
      Some(Files.readString(hashPath).trim) else None
    if (old.contains(current)) return false
    Files.writeString(hashPath, current + "\n")
    Files.writeString(Paths.get(directory, s"${spec.moduleName}.belns"),
      belns(spec, models, useNames = false))
    if (spec.hasNames) {
      Files.writeString(
        Paths.get(directory, s"${spec.moduleName}-names.belns"),
        belns(spec, models, useNames = true))
      Files.writeString(
        Paths.get(directory, s"${spec.moduleName}.belns.mapping"),
        mappingJson(models))
    }
    true
  }
}
