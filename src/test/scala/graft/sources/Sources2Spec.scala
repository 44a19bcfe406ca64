package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class GoSpec extends SparkSpec {
  import spark.implicits._

  private val assoc = Seq(
    ("UniProtKB:P1", "TP53", "9606", "GO:0006915", "apoptosis", false),
    ("UniProtKB:P2", "XXX", "9606", "GO:0006915", "apoptosis", false),
    ("UniProtKB:P1", "TP53", "10090", "GO:0001", "mouse-only", false),
    ("MGI:123", "Zzz", "9606", "GO:0002", "not-uniprot", false))
    .toDF("source_id", "source_name", "taxonomy_id", "target_id",
      "target_label", "negated")
  private val u2h = Seq(("P1", "11998")).toDF("u", "h") // P2 missing → drop
  private val h2n = Seq(("11998", "7157")).toDF("h", "n")

  test("P13/F10: taxon+prefix filters, prefix strips, mapping joins") {
    val p = Go.processed(assoc, u2h, h2n)
    val rows = p.select("uniprot_id", "hgnc_id", "ncbigene_id", "target_id")
      .as[(String, String, String, String)].collect()
    assert(rows.toSeq === Seq(("P1", "11998", "7157", "0006915")))
  }

  test("G6: association edges protein→bioprocess with empty citation") {
    val edges = Go.toBel(Go.processed(assoc, u2h, h2n),
      Seq(("0006915", "apoptotic process")).toDF("g", "n"))
    val e = edges.collect().head
    assert(e.getAs[String]("src") === "Protein(ncbigene:7157 ! TP53)")
    assert(e.getAs[String]("dst") ===
      "BiologicalProcess(go:0006915 ! apoptotic process)")
    assert(e.getAs[String]("citation") === "")
  }

  test("G6: hierarchy is_a/part_of edges") {
    val h = Seq(
      ("go", "1", "child1", "go", "9", "root", "is_a"),
      ("go", "2", "child2", "go", "9", "root", "part_of"),
      ("go", "3", "child3", "go", "9", "root", "regulates")) // dropped
      .toDF("child_prefix", "child_id", "child_name", "parent_prefix",
        "parent_id", "parent_name", "relation")
    val got = Go.hierarchyToBel(h).select("relation").as[String]
      .collect().sorted
    assert(got === Array("isA", "partOf"))
  }
}

class HmddSpec extends SparkSpec {
  import spark.implicits._

  private val diseaseDict = Seq(
    ("lung disease", "mondo", "0005275", "lung disease"),
    ("breast cancer", "mondo", "0007254", "breast cancer"),
    ("adenocarcinoma of lung", "mondo", "0005061", "lung adenocarcinoma"))
    .toDF("name", "prefix", "identifier", "label")

  test("F8: comma-swap retry grounds 'disease, lung' and reversed forms") {
    val raw = Seq("lung disease", "disease, lung",
      "lung, adenocarcinoma of", "unknown thing").toDF("disease")
    val g = Hmdd.groundWithRetry(raw, diseaseDict)
      .as[(String, String, String, String)].collect()
      .map(r => r._1 -> r._3).toMap
    assert(g("lung disease") === "0005275")          // direct hit
    assert(g("disease, lung") === "0005275")         // retry 1 swap
    assert(g("lung, adenocarcinoma of") === "0005061") // retry 2 reverse
    assert(g("unknown thing") === null)
  }

  test("A10/A12: toBel grounds both sides, skips ungrounded rows") {
    val raw = Seq(
      ("circ", "hsa-mir-21", "lung disease", "123", "desc1"),
      ("circ", "hsa-mir-21", "nope disease", "124", "desc2"),
      ("circ", "bad-mir", "lung disease", "125", "desc3"))
      .toDF("category", "mir", "disease", "pmid", "description")
    val mirbase = Seq(("hsa-mir-21", "mirbase", "MI0000077", "hsa-mir-21"))
      .toDF("name", "prefix", "identifier", "label")
    val edges = Hmdd.toBel(raw, mirbase, diseaseDict)
    val e = edges.collect()
    assert(e.length === 1)
    assert(e.head.getAs[String]("src") ===
      "MicroRna(mirbase:MI0000077 ! hsa-mir-21)")
    assert(e.head.getAs[String]("citation") === "pubmed:123")
  }
}

class RheaSpec extends SparkSpec {
  import spark.implicits._

  test("G5: reaction builder — sides split, multi-reactive-part skipped, " +
    "reactive-part naming") {
    val rxns = Seq(("10348", "A + B = C")).toDF("reaction_id", "equation")
    val parts = Seq(
      ("10348", "L", "ATP", "30616", null),
      ("10348", "L", "GTP", "37565", "triphosphate"), // named by part
      ("10348", "L", "weird", null, null),            // no chebi → skipped
      ("10348", "R", "ADP", "456216", null),
      ("10348", "R", "multi", "1", "p1"),             // two reactive parts
      ("10348", "R", "multi", "2", "p2"))             // → compound skipped
      .toDF("reaction_id", "side", "compound_name", "chebi_id",
        "reactive_part")
    val r = Rhea.reactions(rxns, parts).collect().head
    assert(r.getAs[String]("name") === "A + B = C")
    assert(r.getAs[Seq[String]]("reactants") === Seq(
      "a(chebi:30616 ! ATP)", "a(chebi:37565 ! triphosphate)"))
    assert(r.getAs[Seq[String]]("products") === Seq("a(chebi:456216 ! ADP)"))
  }
}

class PidSpec extends SparkSpec {
  import spark.implicits._

  private val nodes = Seq(
    (1L, "uniprot:11998", "TP53"),
    (2L, "CHEBI:15996", "GTP"),
    (3L, "family1", "RAF family"),   // proteinfamily w/ members
    (4L, "RAS Family", "RAS"),       // curated mapping
    (5L, "hprd:99", "skipme"))
    .toDF("node_id", "reference", "label")
  private val nodeAttrs = Seq(
    (3L, "type", Some("proteinfamily"), None),
    (3L, "member", None,
      Some(Seq("hgnc.symbol:RAF1", "hgnc.symbol:NOPE", "badprefix:X"))))
    .toDF("po", "name", "value_str", "value_list")
  private val edges = Seq(
    (10L, 1L, 2L, "controls-phosphorylation-of"),
    (11L, 3L, 1L, "in-complex-with"),
    (12L, 4L, 1L, "chemical-affects"),
    (13L, 1L, 5L, "in-complex-with"),     // unresolved node → dropped
    (14L, 1L, 2L, "some-unknown-type"))   // unhandled → dropped
    .toDF("edge_id", "s", "t", "interaction")
  private val edgeAttrs = Seq(
    (10L, "citation", Seq("pubmed:111", "pubmed:222")))
    .toDF("po", "name", "value_list")
  private val hgnc = Seq(("RAF1", "9829")).toDF("sym", "id")
  private val chebi = Seq(("15996", "GTP")).toDF("id", "nm")

  test("J8: node resolution — uniprot/chebi/curated/family; unmapped " +
    "members and hprd dropped") {
    val r = Pid.resolveNodes(nodes, nodeAttrs, hgnc, chebi)
      .as[(Long, Seq[String])].collect().toMap
    assert(r(1L) === Seq("Protein(hgnc:11998 ! TP53)"))
    assert(r(2L) === Seq("Abundance(chebi:15996 ! GTP)"))
    assert(r(3L) === Seq("Protein(hgnc:9829 ! RAF1)")) // only mapped member
    assert(r(4L) === Seq("Protein(fplx:RAS)"))
    assert(!r.contains(5L))
  }

  test("G4: dispatch — pmod(Ph) target, citation explode, default ndex " +
    "citation, activity modifier, unhandled dropped") {
    val resolved = Pid.resolveNodes(nodes, nodeAttrs, hgnc, chebi)
    val bel = Pid.toBel(edges, edgeAttrs, resolved, "uuid-1")
    val rows = bel.collect()
    val phos = rows.filter(_.getAs[String]("relation") == "regulates")
      .filter(_.getAs[String]("dst").contains("pmod(Ph)"))
    assert(phos.length === 2) // two exploded citations
    assert(phos.map(_.getAs[String]("citation")).sorted.toSeq ===
      Seq("111", "222"))
    val complexEdge = rows.filter(_.getAs[String]("relation") == "binds")
    assert(complexEdge.length === 1)
    assert(complexEdge.head.getAs[String]("citation") === "ndex:uuid-1")
    val activity = rows.filter(r =>
      r.getAs[String]("object_modifier") == "activity")
    assert(activity.length === 1)
    assert(activity.head.getAs[String]("src") === "Protein(fplx:RAS)")
    assert(!rows.exists(_.getAs[String]("src").contains("skipme")))
  }
}

class EtlSpec extends SparkSpec {
  import spark.implicits._

  test("S11: OBO parse — terms, is_a and relationship edges") {
    val obo = """format-version: 1.2
                |
                |[Term]
                |id: GO:0000001
                |name: mitochondrion inheritance
                |namespace: biological_process
                |is_a: GO:0048308 ! organelle inheritance
                |is_a: GO:0048311 ! mitochondrion distribution
                |relationship: part_of GO:0007052 ! mitotic spindle
                |
                |[Term]
                |id: GO:0000002
                |name: mitochondrial genome maintenance
                |is_obsolete: true
                |
                |[Typedef]
                |id: part_of
                |""".stripMargin
    val (terms, edges) = graft.etl.Obo.parse(obo)
    assert(terms.map(_.term_id) === Seq("GO:0000001", "GO:0000002"))
    assert(terms.head.name === "mitochondrion inheritance")
    assert(terms(1).obsolete)
    assert(edges === Seq(
      graft.etl.Obo.TermEdge("GO:0000001", "is_a", "GO:0048308"),
      graft.etl.Obo.TermEdge("GO:0000001", "is_a", "GO:0048311"),
      graft.etl.Obo.TermEdge("GO:0000001", "part_of", "GO:0007052")))
  }

  test("S1/S18: landing cache + derived-artifact cache skip semantics") {
    val dir = tmpDir("landing")
    var fetches = 0
    val f = s"$dir/file.txt"
    graft.etl.Readers.ensureLanded(spark, f, p => {
      fetches += 1
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), "x")
    })
    graft.etl.Readers.ensureLanded(spark, f, _ => fetches += 1)
    assert(fetches === 1) // second call skipped
    var builds = 0
    val out = s"$dir/derived"
    def build() = { builds += 1; Seq((1, "a")).toDF("id", "v") }
    graft.etl.Readers.cachedOrBuild(spark, out)(build)
    val df = graft.etl.Readers.cachedOrBuild(spark, out)(build)
    assert(builds === 1 && df.count() === 1)
  }

  test("S4: zipped-CSV member extract + schema'd scan, cached extract") {
    import org.apache.spark.sql.types._
    val dir = tmpDir("zip")
    val zip = s"$dir/data.zip"
    val zos = new java.util.zip.ZipOutputStream(
      new java.io.FileOutputStream(zip))
    zos.putNextEntry(new java.util.zip.ZipEntry("inner/d.csv"))
    zos.write("a,b\n1,x\n2,y\n".getBytes("UTF-8"))
    zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("inner/other.csv"))
    zos.write("z\n9\n".getBytes("UTF-8"))
    zos.closeEntry()
    zos.close()
    val schema = StructType(Seq(StructField("a", IntegerType),
      StructField("b", StringType)))
    val extract = s"$dir/d.csv"
    val df = graft.etl.Readers.zippedCsv(spark, zip, "inner/d.csv",
      extract, schema)
    assert(df.collect().map(r => (r.getInt(0), r.getString(1))).toSet ===
      Set((1, "x"), (2, "y")))
    // cache contract: extract exists -> the zip is not re-read (delete it
    // and scan again)
    java.nio.file.Files.delete(java.nio.file.Paths.get(zip))
    assert(graft.etl.Readers.zippedCsv(spark, zip, "inner/d.csv",
      extract, schema).count() === 2)
    // missing member is an explicit error
    intercept[IllegalArgumentException] {
      val zip2 = s"$dir/data2.zip"
      val z2 = new java.util.zip.ZipOutputStream(
        new java.io.FileOutputStream(zip2))
      z2.putNextEntry(new java.util.zip.ZipEntry("x")); z2.closeEntry()
      z2.close()
      graft.etl.Readers.zippedCsv(spark, zip2, "nope.csv",
        s"$dir/nope.csv", schema)
    }
  }

  test("S17: triples TSV scan") {
    val dir = tmpDir("trip")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/t.tsv"),
      "p(a)\tincreases\tp(b)\np(b)\tdecreases\tp(c)\n")
    val df = graft.etl.Readers.triples(spark, s"$dir/t.tsv")
    assert(df.columns.toSeq === Seq("head", "relation", "tail"))
    assert(df.count() === 2)
  }
}
