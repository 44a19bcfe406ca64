package graft.bel

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Flat columnar encoding of BEL terms on edge rows (the engine's analogue
  * of pybel DSL nodes; SURVEY §1.1). A qualified edge row carries:
  *
  *   src_function, src_namespace, src_identifier, src_name, src_variants,
  *   relation, dst_* (same shape), citation, evidence, annotations,
  *   subject_modifier, object_modifier
  *
  * variants: array<struct<kind,namespace,identifier,name>> (pmod/gmod —
  * reference intact.py:318-395); modifiers: struct<kind,namespace,
  * identifier,name> (activity — intact.py:300-316).
  */
object Terms {

  /** A modification variant struct (pmod/gmod). Default-namespace BEL
    * codes ('Ph', 'Ub', …) carry namespace='bel' and a null identifier. */
  def variant(kind: String, namespace: String, identifier: String,
              name: String): Column =
    struct(lit(kind).as("kind"), lit(namespace).as("namespace"),
      lit(identifier).as("identifier"), lit(name).as("name"))

  def belPmod(shortCode: String): Column =
    variant("pmod", "bel", null, shortCode)

  val noVariants: Column =
    lit(null).cast("array<struct<kind:string,namespace:string," +
      "identifier:string,name:string>>")

  val noModifier: Column =
    lit(null).cast("struct<kind:string,namespace:string," +
      "identifier:string,name:string>")

  def activity(namespace: String = null, identifier: String = null,
               name: String = null): Column =
    struct(lit("activity").as("kind"), lit(namespace).as("namespace"),
      lit(identifier).as("identifier"), lit(name).as("name"))

  /** Canonical BEL-ish term string for node identity / display, e.g.
    * `p(ncbigene:5594 ! MAPK1, pmod(Ph))`. Used as the `src`/`dst` key the
    * Graph utilities operate on. */
  def termString(function: Column, namespace: Column, identifier: Column,
                 name: Column, variants: Column): Column = {
    val core = concat(namespace, lit(":"), coalesce(identifier, lit("")),
      when(name.isNotNull, concat(lit(" ! "), name)).otherwise(lit("")))
    val vs = when(variants.isNotNull && size(variants) > 0,
      concat(lit(", "), concat_ws(", ", transform(variants, v =>
        concat(v.getField("kind"), lit("("),
          when(v.getField("namespace") === "bel", v.getField("name"))
            .otherwise(concat_ws(":",
              v.getField("namespace"),
              coalesce(v.getField("identifier"), v.getField("name")))),
          lit(")"))))))
      .otherwise(lit(""))
    concat(function, lit("("), core, vs, lit(")"))
  }
}
