package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** G1 dispatch tests over a FIXTURES.md §4 MITAB fixture covering every
  * relation class and error channel. */
class IntactSpec extends SparkSpec {
  import spark.implicits._

  private def mi(id: String, label: String) = s"""psi-mi:"MI:$id"($label)"""

  private val pub = "imex:IM-1|pubmed:100"
  private val det = mi("0018", "two hybrid")
  private val db = mi("0469", "intact")
  private val conf = "intact-miscore:0.56"

  lazy val mappings: Intact.Mappings = Intact.Mappings(
    uniprotToEntrez = Seq(("P1", "111"), ("P2", "222")).toDF("u", "e"),
    uniprotMnemonic = Seq(("P3", "MNE_P3")).toDF("u", "m"),
    ncbigeneNames = Seq(("111", "GENE111"), ("222", "GENE222")).toDF("n", "nm"),
    chebiNames = Seq(("15996", "GTP")).toDF("c", "nm"),
    complexportal = Seq(("I1", "CPX-1")).toDF("i", "c"),
    reactome = Seq(("I2", "R-HSA-2")).toDF("i", "r"))

  private def mitab(rows: (String, String, String)*): DataFrame =
    rows.map { case (a, b, t) => (a, b, t, pub, det, db, conf) }
      .toDF("interactor_a", "interactor_b", "interaction_type",
        "publication", "detection_method", "source_database", "confidence")

  private def bel(rows: (String, String, String)*): (DataFrame, DataFrame) =
    Intact.toBel(Intact.processed(mitab(rows: _*), mappings))

  test("F3: interactor grounding dispatch (uniprot→ncbigene/mnemonic, " +
    "chebi, chembl, intact→cpx/reactome, intenz, unhandled)") {
    val df = Intact.processed(mitab(
      ("uniprotkb:P1", "uniprotkb:P2", mi("0914", "association")),
      ("uniprotkb:P3", "uniprotkb:P1", mi("0914", "association")),
      ("chebi:\"CHEBI:15996\"", "uniprotkb:P1", mi("0914", "association")),
      ("chembl target:CHEMBL123x", "uniprotkb:P1", mi("0914", "association")),
      ("intact:I1", "uniprotkb:P1", mi("0914", "association")),
      ("intact:I2", "uniprotkb:P1", mi("0914", "association")),
      ("intact:I9", "uniprotkb:P1", mi("0914", "association")),
      ("genbank:XYZ", "uniprotkb:P1", mi("0914", "association"))), mappings)
    val bySrc = df.select("interactor_a", "src_prefix", "src_identifier",
      "src_name").collect().map(r => r.getString(0) ->
      ((r.getString(1), r.getString(2), r.getString(3)))).toMap
    assert(bySrc("uniprotkb:P1") === (("ncbigene", "111", "GENE111")))
    assert(bySrc("uniprotkb:P3") === (("uniprot", "P3", "MNE_P3")))
    assert(bySrc("chebi:\"CHEBI:15996\"") === (("chebi", "15996", "GTP")))
    assert(bySrc("chembl target:CHEMBL123x") ===
      (("chembl.target", "CHEMBL123", null)))
    assert(bySrc("intact:I1") === (("complexportal", "CPX-1", null)))
    assert(bySrc("intact:I2") === (("reactome", "R-HSA-2", null)))
    assert(bySrc("intact:I9") === (("intact", "I9", null)))
    assert(!bySrc.contains("genbank:XYZ")) // unhandled → dropped
  }

  test("P9/P11: omit-list and EBI- rows are dropped") {
    val df = Intact.processed(mitab(
      ("uniprotkb:P1", "uniprotkb:P2", mi("1110", "predicted interaction")),
      ("intact:EBI-123", "uniprotkb:P2", mi("0914", "association")),
      ("uniprotkb:P1", "uniprotkb:P2", mi("0914", "association"))), mappings)
    assert(df.count() === 1)
  }

  test("G1: increases with pmod; gtpase also carries subject activity") {
    val (edges, _) = bel(
      ("uniprotkb:P1", "uniprotkb:P2", mi("0217", "phosphorylation reaction")),
      ("uniprotkb:P1", "uniprotkb:P2", mi("0883", "gtpase reaction")))
    val byMi = edges.collect()
      .map(r => r.getAs[Map[String, String]]("annotations")("psi-mi") -> r)
      .toMap
    val ph = byMi(mi("0217", "phosphorylation reaction"))
    assert(ph.getAs[String]("relation") === "increases")
    val phVar = ph.getAs[Seq[Row]]("dst_variants").head
    assert(phVar.getAs[String]("name") === "Ph")
    assert(ph.getAs[Row]("subject_modifier") === null)
    val gtp = byMi(mi("0883", "gtpase reaction"))
    assert(gtp.getAs[Row]("subject_modifier")
      .getAs[String]("name") === "GTPase activity")
    assert(gtp.getAs[String]("dst") ===
      "Protein(ncbigene:222 ! GENE222, pmod(go:0003924))")
  }

  test("G1: dna strand elongation retypes target to Gene with gmod") {
    val (edges, _) = bel(
      ("uniprotkb:P1", "uniprotkb:P2", mi("0701", "dna strand elongation")))
    val e = edges.collect().head
    assert(e.getAs[String]("relation") === "increases")
    assert(e.getAs[String]("dst_function") === "Gene")
    val v = e.getAs[Seq[Row]]("dst_variants").head
    assert(v.getAs[String]("kind") === "gmod")
    assert(v.getAs[String]("identifier") === "0022616")
  }

  test("G1: dna cleavage retypes to Gene and takes the SOURCE id " +
    "(reference quirk intact.py:688)") {
    val (edges, _) = bel(
      ("uniprotkb:P1", "uniprotkb:P2", mi("0572", "dna cleavage")))
    val e = edges.collect().head
    assert(e.getAs[String]("relation") === "decreases")
    assert(e.getAs[String]("dst_function") === "Gene")
    assert(e.getAs[String]("dst_identifier") === "111") // src id, not 222
  }

  test("G1: lipid cleavage adds object activity modifier") {
    val (edges, _) = bel(
      ("uniprotkb:P1", "uniprotkb:P2", mi("1355", "lipid cleavage")))
    val e = edges.collect().head
    assert(e.getAs[Row]("object_modifier").getAs[String]("kind") === "activity")
    val v = e.getAs[Seq[Row]]("dst_variants").head
    assert(v.getAs[String]("identifier") === "0016042")
  }

  test("G1: association / regulates / binds classes") {
    val (edges, _) = bel(
      ("uniprotkb:P1", "uniprotkb:P2", mi("0915", "physical association")),
      ("uniprotkb:P1", "uniprotkb:P2", mi("0407", "direct interaction")),
      ("uniprotkb:P1", "uniprotkb:P2", mi("0195", "covalent binding")))
    assert(edges.select("relation").as[String].collect().sorted ===
      Array("association", "binds", "regulates"))
  }

  test("G1: chebi source becomes Abundance; missing pubmed falls back " +
    "to database citation") {
    val df = Seq(("chebi:\"CHEBI:15996\"", "uniprotkb:P1",
      mi("0914", "association"), "doi:xyz", det, db, conf))
      .toDF("interactor_a", "interactor_b", "interaction_type",
        "publication", "detection_method", "source_database", "confidence")
    val (edges, _) = Intact.toBel(Intact.processed(df, mappings))
    val e = edges.collect().head
    assert(e.getAs[String]("src_function") === "Abundance")
    assert(e.getAs[String]("citation") === "database:intact")
  }

  test("G1: unknown relation goes to the rejects side-output, not a crash") {
    val (edges, rejects) = bel(
      ("uniprotkb:P1", "uniprotkb:P2", mi("9999", "made up")),
      ("uniprotkb:P1", "uniprotkb:P2", mi("0914", "association")))
    assert(edges.count() === 1)
    assert(rejects.count() === 1)
  }

  test("G8: exact duplicate rows collapse to one edge") {
    val (edges, _) = bel(
      ("uniprotkb:P1", "uniprotkb:P2", mi("0914", "association")),
      ("uniprotkb:P1", "uniprotkb:P2", mi("0914", "association")))
    assert(edges.count() === 1)
  }

  test("A11: unhandled prefix tally") {
    val tally = Intact.unhandledTally(mitab(
      ("genbank:X", "ensembl:Y", mi("0914", "association")),
      ("genbank:Z", "uniprotkb:P1", mi("0914", "association"))))
      .as[(String, Long)].collect().toMap
    assert(tally === Map("genbank" -> 2L, "ensembl" -> 1L))
  }
}

class BiogridSpec extends SparkSpec {
  import spark.implicits._

  private def mi(id: String, label: String) = s"""psi-mi:"MI:$id"($label)"""

  lazy val mappings: Biogrid.Mappings =
    Biogrid.Mappings(Seq(("100", "9100")).toDF("b", "n"))

  private def mitab(rows: (String, String, String, String)*): DataFrame =
    rows.map { case (a, b, t, p) =>
      (a, b, t, p, "method", "biogrid", "score:1") }
      .toDF("interactor_a", "interactor_b", "interaction_type",
        "publication", "detection_method", "source_database", "confidence")

  test("F6: pmid keeps only the char at index 7 (faithful reference bug, " +
    "biogrid.py:203 — explains citations==9 in its published stats)") {
    val df = Biogrid.processed(mitab(
      ("ncbigene:1", "ncbigene:2", mi("0914", "association"), "pubmed:54321")),
      mappings)
    assert(df.select("pmid").as[String].head() === "5")
  }

  private def messageChain(t: Throwable): String =
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")

  test("strict: non-pubmed publication raises (fused, single scan)") {
    val e = intercept[Exception] {
      Biogrid.toBel(Biogrid.processed(mitab(
        ("ncbigene:1", "ncbigene:2", mi("0914", "association"), "doi:x")),
        mappings)).collect()
    }
    assert(messageChain(e).contains("Non pubmed: doi:x"))
  }

  test("strict: pmid check runs before the NA-interactor skip " +
    "(biogrid.py:227 maps pmids over every row)") {
    val e = intercept[Exception] {
      Biogrid.toBel(Biogrid.processed(mitab(
        ("unmappable:1", "ncbigene:2", mi("0914", "association"), "doi:x")),
        mappings)).collect()
    }
    assert(messageChain(e).contains("Non pubmed: doi:x"))
  }

  test("strict: unknown relation raises (biogrid.py:312)") {
    val e = intercept[Exception] {
      Biogrid.toBel(Biogrid.processed(mitab(
        ("ncbigene:1", "ncbigene:2", mi("9999", "bogus"), "pubmed:1")),
        mappings)).collect()
    }
    assert(messageChain(e).contains("Unhandled BioGrid relation"))
  }

  test("fused validation: constructing the BioGRID pipeline launches NO " +
    "job (the old validate ran an eager scan per pipeline)") {
    def allJobs: Int =
      spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val before = allJobs
    val edges = Biogrid.toBel(Biogrid.processed(mitab(
      ("ncbigene:1", "ncbigene:2", mi("0914", "association"), "pubmed:11")),
      mappings))
    assert(allJobs === before,
      "pipeline construction must be fully lazy — validation rides the " +
        "main pass, not a separate eager job")
    assert(edges.count() === 1)
  }

  test("strict: unknown relation on an NA-skipped row does NOT raise " +
    "(get_bel continues before dispatch, biogrid.py:244-247)") {
    val edges = Biogrid.toBel(Biogrid.processed(mitab(
      ("unmappable:1", "ncbigene:2", mi("9999", "bogus"), "pubmed:1")),
      mappings))
    assert(edges.count() === 0)
  }

  test("F4: interactor mapping — ncbigene pass, biogrid map, remap-to-null " +
    "drop, uniprot remap") {
    val edges = Biogrid.toBel(Biogrid.processed(mitab(
      ("ncbigene:1", "biogrid:100", mi("0914", "association"), "pubmed:11"),
      ("biogrid:4349295", "ncbigene:2", mi("0914", "association"), "pubmed:11"),
      ("uniprot:P0DTD2", "ncbigene:3", mi("0914", "association"), "pubmed:11"),
      ("uniprot:QQQQQ", "ncbigene:4", mi("0914", "association"), "pubmed:11")),
      mappings))
    val pairs = edges.select("src_identifier", "dst_identifier")
      .as[(String, String)].collect().toSet
    assert(pairs === Set(("1", "9100"), ("1489679", "3")))
  }

  test("G2: genetic interactions are Gene-Gene; physical are Protein") {
    val edges = Biogrid.toBel(Biogrid.processed(mitab(
      ("ncbigene:1", "ncbigene:2",
        mi("0794", "synthetic genetic interaction defined by inequality"),
        "pubmed:11"),
      ("ncbigene:1", "ncbigene:2", mi("0915", "physical association"),
        "pubmed:11"),
      ("ncbigene:1", "ncbigene:2", mi("0407", "direct interaction"),
        "pubmed:11")), mappings))
    val got = edges.select("relation", "src_function")
      .as[(String, String)].collect().toSet
    assert(got === Set(("association", "Gene"), ("association", "Protein"),
      ("binds", "Protein")))
  }
}

class TfregulonsSpec extends SparkSpec {
  import spark.implicits._

  lazy val hgnc: DataFrame = Seq(("TP53", "11998"), ("MDM2", "6973"),
    ("EGFR", "3236")).toDF("hgnc_symbol", "hgnc_id")

  private def raw(rows: (String, String, Int, String, String)*): DataFrame =
    rows.toDF("tf_hgnc_symbol", "target_hgnc_symbol", "effect", "score",
      "pmids")

  test("P12/J3: score filter + hgnc grounding with missing-id drop") {
    val df = Tfregulons.processed(raw(
      ("TP53", "MDM2", 1, "A", "1"),
      ("TP53", "MDM2", 1, "D", "1"),      // score D filtered
      ("TP53", "NOPE", 1, "A", "1"),      // missing target id
      ("NOPE", "MDM2", 1, "A", "1")), hgnc) // missing tf id
    assert(df.count() === 1)
  }

  test("G3: each row explodes into 3 edges per citation; effect 0 skipped") {
    val edges = Tfregulons.toBel(Tfregulons.processed(raw(
      ("TP53", "MDM2", 1, "A", "100,200"),
      ("TP53", "EGFR", 0, "A", "300")), hgnc))
    // 2 citations × (direct + indirect) + 1 deduped transcription = 5
    assert(edges.count() === 5)
    val rels = edges.groupBy("relation").count()
      .as[(String, Long)].collect().toMap
    assert(rels === Map("directlyIncreases" -> 2L, "increases" -> 2L,
      "transcribedTo" -> 1L))
    val complexSrc = edges.filter(col("relation") === "directlyIncreases")
      .select("src").distinct().as[String].head()
    assert(complexSrc ===
      "complex(Protein(hgnc:11998 ! TP53), Gene(hgnc:6973 ! MDM2))")
  }

  test("G3: effect -1 produces the decreases pair") {
    val edges = Tfregulons.toBel(Tfregulons.processed(raw(
      ("TP53", "MDM2", -1, "B", "1")), hgnc))
    val rels = edges.select("relation").as[String].collect().toSet
    assert(rels === Set("directlyDecreases", "decreases", "transcribedTo"))
  }

  test("J4: enrich filter keeps only graph-member targets") {
    val p = Tfregulons.processed(raw(
      ("TP53", "MDM2", 1, "A", "1"),
      ("TP53", "EGFR", 1, "A", "1")), hgnc)
    val kept = Tfregulons.enrichFilter(p, Seq("6973").toDF("id"))
    assert(kept.select("target_hgnc_id").as[String].collect().toSeq ===
      Seq("6973"))
  }
}
