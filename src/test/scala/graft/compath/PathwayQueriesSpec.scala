package graft.compath

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** ComPath query-surface tests over the FIXTURES.md §3 fixture: a protein
  * in ≥2 pathways, a pathway with 0 proteins, a protein with null
  * hgnc_symbol, duplicate pathway names (reference semantics:
  * compath/manager.py + tests/test_compath_manager.py). */
class PathwayQueriesSpec extends SparkSpec {
  import spark.implicits._

  lazy val store: PathwayStore = PathwayStore(
    pathways = Seq(
      (1L, "pw1", "signal transduction"),
      (2L, "pw2", "apoptosis"),
      (3L, "pw3", "signal transduction"), // duplicate name
      (4L, "pw4", "empty pathway")        // 0 proteins
    ).toDF("pathway_id", "identifier", "name"),
    proteins = Seq(
      (10L, "HGNC:1", "TP53"),
      (11L, "HGNC:2", "BRCA1"),
      (12L, "HGNC:3", "EGFR"),
      (13L, "HGNC:4", null)               // null symbol
    ).toDF("protein_id", "hgnc_id", "hgnc_symbol"),
    membership = Seq(
      (1L, 10L), (1L, 11L), (1L, 13L),
      (2L, 10L),                          // TP53 in 2 pathways
      (3L, 12L)
    ).toDF("pathway_id", "protein_id"))

  lazy val q = new PathwayQueries(store)

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  test("P2: one-or-none point lookup") {
    assert(q.getPathwayById("pw2").map(_.getAs[String]("name")) ===
      Some("apoptosis"))
    assert(q.getPathwayById("nope").isEmpty)
  }

  test("P3: get_pathways_by_name returns ALL matches (duplicate names)") {
    val ids = q.getPathwaysByName("signal transduction")
      .select("identifier").as[String].collect().sorted
    assert(ids === Array("pw1", "pw3"))
  }

  test("P4: IN-list protein fetch") {
    val got = q.proteinsByHgncSymbols(Seq("TP53", "EGFR", "NOPE"))
      .select("hgnc_symbol").as[String].collect().sorted
    assert(got === Array("EGFR", "TP53"))
  }

  test("P5/P6: substring + case-insensitive search") {
    assert(q.searchProteins("BRCA").count() === 1)
    assert(q.searchPathways("SIGNAL").count() === 2) // ILIKE semantics
  }

  test("J1/P7: pathway-protein join drops null symbols") {
    val got = rows(q.pathwayToProtein())
    assert(got.size === 4) // 5 memberships - 1 null-symbol protein
    assert(!got.exists(_.contains(null)))
  }

  test("A8: gene sets are sorted distinct arrays") {
    val sets = q.geneSets().as[(String, Seq[String])].collect().toMap
    assert(sets("pw1") === Seq("BRCA1", "TP53"))
    assert(sets("pw2") === Seq("TP53"))
    assert(!sets.contains("pw4")) // empty pathway absent (inner join)
  }

  test("A9: global distinct symbols") {
    assert(q.allHgncSymbols().as[String].collect().sorted ===
      Array("BRCA1", "EGFR", "TP53"))
  }

  test("A4/A5: sizes and degrees with HAVING") {
    val sizes = q.pathwaySizes().as[(Long, Long)].collect().toMap
    assert(sizes === Map(1L -> 3L, 2L -> 1L, 3L -> 1L)) // pw4 absent
    val degrees = q.geneDegrees().as[(Long, Long)].collect().toMap
    assert(degrees(10L) === 2L) // TP53 in 2 pathways
  }

  test("A6 flagship: enrichment returns mapped/size/gene_set per pathway") {
    val r = q.enrich(Seq("TP53", "EGFR"))
      .select("identifier", "mapped_proteins", "pathway_size", "gene_set")
      .as[(String, Long, Long, Seq[String])].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    // pw1: TP53 matched of {TP53, BRCA1, null-protein} -> size counts
    // distinct proteins incl. the null-symbol one (membership-level size,
    // reference len(pathway.proteins) counts all members)
    assert(r("pw1") === ((1L, 3L, Seq("BRCA1", "TP53"))))
    assert(r("pw2") === ((1L, 1L, Seq("TP53"))))
    assert(r("pw3") === ((1L, 1L, Seq("EGFR"))))
    assert(!r.contains("pw4")) // unmatched pathway not in result
  }

  test("G7: BEL export emits one partOf edge per membership, deduped") {
    val edges = q.toBelEdges("pid").collect()
    assert(edges.length === 4)
    assert(edges.forall(_.getAs[String]("relation") == "partOf"))
  }

  test("J5: enrichPathways adds edges only for graph pathway nodes, " +
    "namespace case-insensitively, null identifiers skipped") {
    val graphNodes = Seq(
      ("PID", "pw1"),                  // uppercase namespace still matches
      ("pid", null.asInstanceOf[String]), // null identifier skipped
      ("other", "pw2"),                // wrong namespace skipped
      ("pid", "nope")                  // unknown pathway: no edges
    ).toDF("namespace", "identifier")
    val got = q.enrichPathways(graphNodes, "pid")
      .select("src", "dst").as[(String, String)].collect().toSet
    // pw1 members with non-null symbols: TP53, BRCA1 (null-symbol skipped)
    assert(got === Set(("hgnc:TP53", "pid:pw1"), ("hgnc:BRCA1", "pid:pw1")))
  }

  test("J6: enrichProteins adds the FULL membership of every pathway " +
    "containing a graph protein") {
    val ids = Seq("HGNC:3").toDF("hgnc_id") // EGFR, only in pw3
    val got = q.enrichProteins(ids, "pid")
      .select("src", "dst").as[(String, String)].collect().toSet
    assert(got === Set(("hgnc:EGFR", "pid:pw3")))
    // TP53 pulls in BOTH its pathways, with their complete member lists
    val got2 = q.enrichProteins(Seq("HGNC:1").toDF("hgnc_id"), "pid")
      .select("src", "dst").as[(String, String)].collect().toSet
    assert(got2 === Set(
      ("hgnc:TP53", "pid:pw1"), ("hgnc:BRCA1", "pid:pw1"),
      ("hgnc:TP53", "pid:pw2")))
  }
}
