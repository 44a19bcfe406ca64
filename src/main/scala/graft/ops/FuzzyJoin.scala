package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked edit-distance self-join (entity resolution / fuzzy dedup): all
  * pairs of rows whose strings are within Levenshtein distance `maxDist`,
  * without ever forming the |N|² cross product. The reference grounds
  * noisy source names against curated vocabularies with normalize-retry
  * loops (`sources/hmdd.py` grounding retries); at corpus scale the same
  * need — "which near-identical names are the same entity" — requires a
  * blocked join, since Spark plans a raw `levenshtein(a,b) <= d` join as
  * BroadcastNestedLoop (quadratic, cluster-fatal).
  *
  * Scheme (the partition-signature family of PassJoin, Li et al. ICDE
  * 2011, re-expressed as declarative explode + equi-join):
  *
  *  - INDEX side: each string r of length n ≥ d+1 splits into d+1
  *    contiguous segments (even split, longer segments last). If
  *    ed(r,s) ≤ d, at most d segments can be touched by an edit, so at
  *    least one segment of r survives VERBATIM as a substring of s —
  *    and any preserved position shifts by at most d (each edit moves
  *    downstream characters by ≤ 1).
  *  - PROBE side: each string s of length m ≥ 2d+1 enumerates, for every
  *    candidate index length n in [m−d, m] and segment index i, the
  *    substrings of s with the segment-i length whose start lies within
  *    ±d of the segment-i start — ≤ (d+1)²·(2d+1) short keys, a constant
  *    explode factor (45 at d = 2).
  *  - Candidates meet by EQUI-join on (segment text, segment index,
  *    index length); only co-bucketed pairs are verified, with the
  *    early-abandoning `levenshtein(a, b, threshold)` (codegen'd, stops
  *    at d+1). Multi-emitted candidates collapse by `distinct` AFTER the
  *    verify filter, when the stream is matches-only.
  *  - SHORT strings (length ≤ 2d, where segments degenerate) pair in a
  *    single side bucket: any pair with BOTH lengths ≤ 2d is checked
  *    there, and only there (a pair spanning the 2d boundary has length
  *    gap ≤ d, so its shorter side is ≥ d+1 and the main path finds it).
  *    Complete because ed ≥ |length gap|: a ≤ d-edit partner of a ≤ d+…
  *    short string is itself short. The bucket is all-pairs but
  *    alphabet-bounded: there are only |Σ|^(2d) strings that short —
  *    pre-`distinct` the short side if a corpus hammers it.
  *
  * Known degradation (inherited from every partition-signature scheme):
  * a corpus whose strings share a long uniform prefix funnels everything
  * through the shared-segment buckets — candidate pruning comes from
  * segment DIVERSITY. Strip known constant prefixes before joining.
  *
  * Output: (a_id, b_id, dist), one row per unordered pair, canonically
  * ordered by (length, id) — a is the shorter string (ties: smaller id).
  * NULL strings never match (SQL levenshtein semantics: NULL in, NULL
  * out). Rows are NOT deduplicated by string value: two rows with equal
  * strings are a distance-0 pair.
  */
object FuzzyJoin {

  /** All row pairs with `levenshtein(strCol_a, strCol_b) <= maxDist`,
    * as (a_id, b_id, dist) with (length, id)-canonical pair order. */
  def fuzzyPairs(df: DataFrame, idCol: String, strCol: String,
                 maxDist: Int): DataFrame = {
    require(maxDist >= 1 && maxDist <= 8,
      s"maxDist must be in [1, 8], got $maxDist")
    val d = maxDist
    val k = d + 1 // segments; pigeonhole: ≤ d edits leave one untouched

    // Materialized ONCE (lineage cut): the narrow (id, s, n) frame is
    // referenced four times below (index side, probe side, both short-
    // bucket sides) — un-cut, each reference re-scans the input and
    // re-evaluates the projection, i.e. four full corpus passes for one
    // logical read (r14; the Dedup.jaccardPairs staging discipline).
    val rows = graft.core.Checkpoints.cut(
      df.select(col(idCol).cast("long").as("id"),
        col(strCol).as("s")).filter(col("s").isNotNull)
        .withColumn("n", length(col("s"))))

    // Even segment split of a length-n string: l = n div k short segments
    // first, the n mod k longer ones (l+1) last. Start/len of segment i
    // as plan-time arithmetic over the length column (i is a literal).
    def segLen(n: Column, i: Int): Column =
      (n / k).cast("int") + when(lit(i) >= lit(k) - n % k, 1).otherwise(0)
    def segStart(n: Column, i: Int): Column =
      lit(i) * (n / k).cast("int") +
        greatest(lit(0), lit(i) - (lit(k) - n % k).cast("int"))

    // INDEX side: strings long enough to have nonempty segments. Any pair
    // the main path must find has its longer side ≥ 2d+1, hence its
    // shorter side ≥ d+1 — shorter strings only ever pair in the bucket.
    val index = rows.filter(col("n") >= k).select(
      col("id").as("a_id"), col("s").as("a_s"), col("n").as("a_n"),
      explode(array((0 until k).map(i => struct(
        col("s").substr(segStart(col("n"), i) + 1, segLen(col("n"), i))
          .as("seg"),
        lit(i).as("idx"),
        col("n").as("len"))): _*)).as("key"))
      .select(col("a_id"), col("a_s"), col("a_n"),
        col("key.seg"), col("key.idx"), col("key.len"))

    // PROBE side: for each admissible index length n = m − delta and each
    // segment index, every substring whose start is within ±d of that
    // segment's home position. Invalid (out-of-range) starts yield a NULL
    // struct filtered before the explode.
    val probe = rows.filter(col("n") >= 2 * d + 1).select(
      col("id").as("b_id"), col("s").as("b_s"), col("n").as("b_n"),
      explode(filter(array((for {
        delta <- 0 to d
        i <- 0 until k
        shift <- -d to d
      } yield {
        val n = col("n") - delta
        val start = segStart(n, i) + shift
        val len = segLen(n, i)
        when(n >= k && start >= 0 && start + len <= col("n"),
          struct(col("s").substr(start + 1, len).as("seg"),
            lit(i).as("idx"), n.as("len")))
      }): _*), _.isNotNull)).as("key"))
      .select(col("b_id"), col("b_s"), col("b_n"),
        col("key.seg"), col("key.idx"), col("key.len"))

    // Equi-join on the signature; n ≤ m by construction, ties order by id.
    val mainPairs = index.join(probe, Seq("seg", "idx", "len"))
      .filter(col("a_n") < col("b_n") ||
        (col("a_n") === col("b_n") && col("a_id") < col("b_id")))

    // SHORT bucket: all pairs with both lengths ≤ 2d, length gap ≤ d.
    val short = rows.filter(col("n") <= 2 * d)
    val shortPairs = short.select(col("id").as("a_id"), col("s").as("a_s"),
        col("n").as("a_n"))
      .join(short.select(col("id").as("b_id"), col("s").as("b_s"),
        col("n").as("b_n")),
        (col("a_n") < col("b_n") ||
          (col("a_n") === col("b_n") && col("a_id") < col("b_id"))) &&
          col("b_n") - col("a_n") <= d)

    def verified(cands: DataFrame): DataFrame = cands
      .withColumn("dist",
        levenshtein(col("a_s"), col("b_s"), d).cast("long"))
      .filter(col("dist") >= 0)
      .select("a_id", "b_id", "dist")

    verified(mainPairs).unionByName(verified(shortPairs)).distinct()
  }
}
