package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.bel.Terms

/** HMDD miRNA-disease source (S9 + F8 + A10 + A12; reference
  * sources/hmdd.py:20-85).
  *
  * Grounding is the classic dictionary-encode pattern (A10): take
  * DISTINCT raw strings, ground each once against broadcast name
  * dictionaries, then join the groundings back — never a per-row UDF call
  * against the full fact table. The reference's comma-swap retry
  * heuristics (:57-64) become coalesce over three join attempts on
  * progressively rewritten keys. */
object Hmdd {

  val tsvSchema: StructType = StructType(Seq(
    StructField("category", StringType),
    StructField("mir", StringType),
    StructField("disease", StringType),
    StructField("pmid", StringType),
    StructField("description", StringType)))

  /** S9: TSV scan, all-string, latin-1 (hmdd.py:24-31). */
  def readTsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("sep", "\t").option("header", "true")
      .option("encoding", "ISO-8859-1")
      .schema(tsvSchema).csv(path)

  /** Retry 1 (hmdd.py:58-60): 'disease, lung' → 'lung disease' (swap at
    * the FIRST ', '); null when there is no comma. */
  private[sources] def swapFirst(c: Column): Column = {
    val i = instr(c, ", ")
    when(i > 0,
      concat(c.substr(i + 2, length(c)), lit(" "), c.substr(lit(1), i - 1)))
  }

  /** Retry 2 (hmdd.py:61-63): reverse ALL comma-separated parts. */
  private[sources] def reverseParts(c: Column): Column =
    array_join(reverse(transform(split(c, ","), p => trim(p))), " ")

  /** A10/F8: ground distinct raw names against a dictionary
    * `dict(name, prefix, identifier, label)`, with the comma-swap
    * retries. Returns (raw, prefix, identifier, label); ungrounded rows
    * carry nulls. */
  def groundWithRetry(rawNames: DataFrame, dict: DataFrame): DataFrame = {
    val raw = rawNames.columns.head
    val distinctNames = rawNames.select(col(raw).as("raw")).distinct()
      .withColumn("try1", swapFirst(col("raw")))
      .withColumn("try2", reverseParts(col("raw")))
    def attempt(df: DataFrame, key: String, n: Int): DataFrame =
      df.join(broadcast(dict.toDF(s"k$n", s"p$n", s"i$n", s"l$n")),
        col(key) === col(s"k$n"), "left").drop(s"k$n")
    val grounded = attempt(attempt(attempt(
      distinctNames, "raw", 0), "try1", 1), "try2", 2)
    grounded.select(col("raw"),
      coalesce(col("p0"), col("p1"), col("p2")).as("prefix"),
      coalesce(col("i0"), col("i1"), col("i2")).as("identifier"),
      coalesce(col("l0"), col("l1"), col("l2")).as("label"))
  }

  /** Full pipeline: ground mirs (mirbase dict) and diseases
    * (multi-ontology dict), join back (A12), emit regulates edges
    * MicroRna → Pathology; rows with an ungrounded side are skipped
    * (hmdd.py:80-82). */
  def toBel(raw: DataFrame, mirbase: DataFrame,
            diseaseDict: DataFrame): DataFrame = {
    val mirs = groundWithRetry(raw.select("mir"), mirbase)
      .toDF("mir_raw", "mir_prefix", "mir_id", "mir_name")
    val diseases = groundWithRetry(raw.select("disease"), diseaseDict)
      .toDF("dis_raw", "dis_prefix", "dis_id", "dis_name")
    val joined = raw
      .join(broadcast(mirs), col("mir") === col("mir_raw"), "left")
      .join(broadcast(diseases), col("disease") === col("dis_raw"), "left")
      .filter(col("mir_id").isNotNull && col("dis_id").isNotNull)
    val edges = joined.select(
      lit("MicroRna").as("src_function"),
      col("mir_prefix").as("src_namespace"),
      col("mir_id").as("src_identifier"),
      col("mir_name").as("src_name"),
      Terms.noVariants.as("src_variants"),
      lit("regulates").as("relation"),
      lit("Pathology").as("dst_function"),
      col("dis_prefix").as("dst_namespace"),
      col("dis_id").as("dst_identifier"),
      col("dis_name").as("dst_name"),
      Terms.noVariants.as("dst_variants"),
      concat(lit("pubmed:"), col("pmid")).as("citation"),
      col("description").as("evidence"),
      lit(null).cast("map<string,string>").as("annotations"),
      Terms.noModifier.as("subject_modifier"),
      Terms.noModifier.as("object_modifier"))
    graft.bel.Graph.dedupEdges(edges
      .withColumn("src", Terms.termString(col("src_function"),
        col("src_namespace"), col("src_identifier"), col("src_name")))
      .withColumn("dst", Terms.termString(col("dst_function"),
        col("dst_namespace"), col("dst_identifier"), col("dst_name"))))
  }
}
