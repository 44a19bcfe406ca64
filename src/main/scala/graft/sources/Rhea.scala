package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Rhea reaction source (S12 + G5; reference sources/rhea.py:30-126).
  *
  * The RDF parse + two SPARQL queries are a one-time driver-side staging
  * step (SURVEY S12); the engine consumes the prestaged relational form:
  *   reactions(reaction_id, equation)
  *   participants(reaction_id, side 'L'|'R', compound_name, chebi_id,
  *                reactive_part)
  *
  * G5 semantics replicated exactly: a participant node is
  * chebi:<id> named by the reactive part when present else the compound
  * name; null-chebi rows contribute nothing; a compound with != 1
  * distinct node (multiple reactive parts, or none) is SKIPPED
  * (rhea.py:109-121). */
object Rhea {

  val reactionSchema: StructType = StructType(Seq(
    StructField("reaction_id", StringType),
    StructField("equation", StringType)))

  val participantSchema: StructType = StructType(Seq(
    StructField("reaction_id", StringType),
    StructField("side", StringType),
    StructField("compound_name", StringType),
    StructField("chebi_id", StringType),
    StructField("reactive_part", StringType)))

  /** G5: one row per reaction with sorted reactant/product term arrays.
    * Two shuffles (compound-level then reaction-level aggregation), both
    * on reaction keys — no collect, no loops. */
  def reactions(reactions: DataFrame, participants: DataFrame): DataFrame = {
    val nodes = participants
      .withColumn("node",
        when(col("chebi_id").isNotNull,
          concat(lit("a(chebi:"), col("chebi_id"), lit(" ! "),
            coalesce(col("reactive_part"), col("compound_name")), lit(")"))))
    // exactly-one-distinct-node compounds survive (rhea.py:109-121)
    val perCompound = nodes
      .groupBy("reaction_id", "side", "compound_name")
      .agg(collect_set(col("node")).as("ns"))
      .filter(size(col("ns")) === 1)
      .select(col("reaction_id"), col("side"),
        element_at(col("ns"), 1).as("node"))
    val perReaction = perCompound
      .groupBy("reaction_id")
      .agg(
        sort_array(collect_list(when(col("side") === "L", col("node"))))
          .as("reactants"),
        sort_array(collect_list(when(col("side") === "R", col("node"))))
          .as("products"))
    reactions
      .join(perReaction, Seq("reaction_id"), "left")
      .select(col("reaction_id"),
        lit("RHEA").as("namespace"),
        col("equation").as("name"),
        coalesce(col("reactants"), array().cast("array<string>"))
          .as("reactants"),
        coalesce(col("products"), array().cast("array<string>"))
          .as("products"))
      .dropDuplicates("reaction_id")
  }
}
