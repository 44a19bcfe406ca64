package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.bel.Terms

/** TFregulons pipeline (S8 + G3 + J3/J4) — reference tfregulons.py.
  *
  * G3 is the generator-shaped dispatch: each surviving row explodes into
  * one edge-triple PER comma-separated citation (tfregulons.py:108-131):
  *   1. complex(p(tf), g(target)) directly±regulates r(target)
  *   2. p(tf) ±regulates r(target)
  *   3. g(target) transcribedTo r(target)   (unqualified; dedups to one)
  * In Spark: explode(split(pmids)) × union of three select templates —
  * no loops, no UDFs.
  */
object Tfregulons {

  val Evidence = "From TFregulons"

  val csvSchema: StructType = StructType(Seq(
    StructField("tf_hgnc_symbol", StringType),
    StructField("target_hgnc_symbol", StringType),
    StructField("effect", IntegerType),
    StructField("score", StringType),
    StructField("pmids", StringType)))

  /** S8 (tfregulons.py:29-41): CSV scan with rename built into schema. */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").schema(csvSchema).csv(path)

  /** P12 + J3 (tfregulons.py:43-59): score-class filter and broadcast
    * hgnc name→id mapping for TF and target; missing ids drop the row.
    * `hgnc` columns: (hgnc_symbol, hgnc_id). */
  def processed(raw: DataFrame, hgnc: DataFrame): DataFrame =
    raw
      .filter(col("score").isin("A", "B", "C"))
      .join(broadcast(hgnc.toDF("tf_sym_key", "tf_hgnc_id")),
        col("tf_hgnc_symbol") === col("tf_sym_key"), "left")
      .join(broadcast(hgnc.toDF("tgt_sym_key", "target_hgnc_id")),
        col("target_hgnc_symbol") === col("tgt_sym_key"), "left")
      .drop("tf_sym_key", "tgt_sym_key")
      .filter(col("tf_hgnc_id").isNotNull && col("target_hgnc_id").isNotNull)

  /** J4 (tfregulons.py:81-87): keep rows whose target is in the graph's
    * HGNC id set — a left-semi join. */
  def enrichFilter(processed: DataFrame, graphHgncIds: DataFrame): DataFrame =
    processed.join(broadcast(graphHgncIds),
      processed("target_hgnc_id") === graphHgncIds(graphHgncIds.columns.head),
      "left_semi")

  /** G3 (tfregulons.py:89-131). Returns the deduped qualified edge set. */
  def toBel(processed: DataFrame): DataFrame = {
    val base = processed
      .filter(col("effect") =!= 0) // effect 0 ⇒ skipped (:92-93)
      .select(col("tf_hgnc_id"), col("tf_hgnc_symbol"),
        col("target_hgnc_id"), col("target_hgnc_symbol"), col("effect"),
        explode(transform(split(col("pmids"), ","), p => trim(p)))
          .as("citation"))

    def term(fn: String, id: org.apache.spark.sql.Column,
             nm: org.apache.spark.sql.Column) =
      Terms.termString(lit(fn), lit("hgnc"), id, nm)
    val tfP = term("Protein", col("tf_hgnc_id"), col("tf_hgnc_symbol"))
    val tgtR = term("Rna", col("target_hgnc_id"), col("target_hgnc_symbol"))
    val tgtG = term("Gene", col("target_hgnc_id"), col("target_hgnc_symbol"))
    val complexTerm = concat(lit("complex("), tfP, lit(", "), tgtG, lit(")"))

    def shell(src: org.apache.spark.sql.Column, srcFn: String,
              srcNs: String, srcId: org.apache.spark.sql.Column,
              srcName: org.apache.spark.sql.Column,
              rel: org.apache.spark.sql.Column,
              cit: org.apache.spark.sql.Column,
              ev: org.apache.spark.sql.Column) =
      base.select(
        src.as("src"),
        lit(srcFn).as("src_function"),
        lit(srcNs).cast("string").as("src_namespace"),
        srcId.as("src_identifier"),
        srcName.as("src_name"),
        Terms.noVariants.as("src_variants"),
        rel.as("relation"),
        tgtR.as("dst"),
        lit("Rna").as("dst_function"),
        lit("hgnc").as("dst_namespace"),
        col("target_hgnc_id").as("dst_identifier"),
        col("target_hgnc_symbol").as("dst_name"),
        Terms.noVariants.as("dst_variants"),
        cit.as("citation"),
        ev.as("evidence"),
        lit(null).cast("map<string,string>").as("annotations"),
        Terms.noModifier.as("subject_modifier"),
        Terms.noModifier.as("object_modifier"))

    val nullStr = lit(null).cast("string")
    val direct = shell(complexTerm, "ComplexAbundance", null,
      nullStr, nullStr,
      when(col("effect") === 1, "directlyIncreases")
        .otherwise("directlyDecreases"),
      col("citation"), lit(Evidence))
    val indirect = shell(tfP, "Protein", "hgnc",
      col("tf_hgnc_id"), col("tf_hgnc_symbol"),
      when(col("effect") === 1, "increases").otherwise("decreases"),
      col("citation"), lit(Evidence))
    // transcription edges are unqualified (graph.add_transcription, :131)
    val transcription = shell(tgtG, "Gene", "hgnc",
      col("target_hgnc_id"), col("target_hgnc_symbol"),
      lit("transcribedTo"), nullStr, nullStr)

    // BELGraph dedups identical (un)qualified edges — dedup on the
    // canonical edge identity (MAP columns can't go through dropDuplicates).
    graft.bel.Graph.dedupEdges(
      direct.unionByName(indirect).unionByName(transcription))
  }
}
