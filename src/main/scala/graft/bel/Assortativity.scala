package graft.bel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Degree assortativity (Newman, "Assortative mixing in networks", PRL
  * 89:208701, 2002): the Pearson correlation of endpoint degrees over
  * the edges of the simple undirected graph — positive when hubs link
  * to hubs (social graphs), negative when hubs link to leaves
  * (technological/biological graphs). The one-number mixing summary
  * beside [[Triangles]]' cohesion and [[KCore]]'s density.
  *
  * Formulation over DIRECTED pairs (each undirected edge counted both
  * ways, the standard symmetric estimator, which makes Σx = Σy and
  * Σx² = Σy²):
  *
  *   r = (M·Σxy − Σx·Σy) / (M·Σxx − Σx·Σx)
  *
  * with x, y the endpoint degrees of each of the M = 2m directed pairs.
  * All five sums are exact BIGINTs (one degree aggregation + one
  * dimension join + one global aggregation — every stage map-side
  * combined); r is ONE IEEE division of exact integers, so even the
  * float is engine-bit-identical. Overflow bound: `M·Σxy < 2⁶³` ⇒
  * `m·d̄·d_max² ≲ 4.6·10¹⁸` — beyond that, widen the sums to
  * decimal(38,0) (one cast, same plan). A degree-regular graph has zero
  * variance; r emits NULL there (undefined correlation), never a
  * division error. Output: one row `(m_pairs, s_x, s_xy, s_xx, r)`.
  */
object Assortativity {

  def degreeAssortativity(edges: DataFrame): DataFrame = {
    // canonicalization on the RAW endpoint values (least/greatest works
    // on any orderable type): no hash, so no collision caveat at all —
    // unlike the iterative loops, nothing here re-joins on the key
    // after the fold, so there is no shuffle-width reason to encode
    val und = edges
      .filter(col("src").isNotNull && col("dst").isNotNull &&
        col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("u"),
        greatest(col("src"), col("dst")).as("v"))
      .distinct()
    val dir = und.select(col("u").as("a"), col("v").as("b"))
      .unionByName(und.select(col("v").as("a"), col("u").as("b")))
    val deg = dir.groupBy(col("a").as("id"))
      .agg(count(lit(1)).as("deg"))
    val pairs = dir
      .join(deg.select(col("id").as("a"), col("deg").as("dx")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("dy")), "b")
    pairs.agg(
        count(lit(1)).as("m_pairs"),
        sum(col("dx")).as("s_x"),
        sum(col("dx") * col("dy")).as("s_xy"),
        sum(col("dx") * col("dx")).as("s_xx"))
      .select(col("m_pairs"), col("s_x"), col("s_xy"), col("s_xx"),
        ((col("m_pairs") * col("s_xy") - col("s_x") * col("s_x"))
          .cast("double") /
          nullif((col("m_pairs") * col("s_xx") -
            col("s_x") * col("s_x")).cast("double"), lit(0.0))).as("r"))
  }
}
