package graft.bel

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Namespace make/update/export parity tests (reference
  * tests/test_manager_namespace.py:66-130: make → 5 entries; incremental
  * update adds 4; hash-guarded export skips when unchanged). */
class NamespacesSpec extends SparkSpec {
  import spark.implicits._

  private val spec = NamespaceSpec.forModule("test")

  private def models5: DataFrame =
    (0 until 5).map(i => (s"MODEL:$i", s"$i$i$i$i$i", "B"))
      .toDF("identifier", "name", "encoding")

  private def models9: DataFrame =
    ((0 until 5).map(i => (s"MODEL:$i", s"$i$i$i$i$i", "B")) ++
      (5 until 9).map(i => (s"MODEL:$i", s"$i$i$i$i$i", "B")) :+
      (("MODEL:9", null, "B"))) // null name → skipped on update
      .toDF("identifier", "name", "encoding")

  test("K12: make namespace uploads 5 entries with exact ids/names") {
    val store = new NamespaceStore(spark, tmpDir("ns"), () => "v1")
    store.upload(spec, models5)
    assert(store.get(spec) === Some((spec.url, "v1")))
    val got = store.entries(spec.url)
      .select("identifier", "name").as[(String, String)].collect().sorted
    assert(got.length === 5)
    assert(got.head === (("MODEL:0", "00000")))
  }

  test("A7: incremental update adds 4, skips the null-named one " +
    "(test_manager_namespace.py:108-130)") {
    val store = new NamespaceStore(spark, tmpDir("ns"), () => "v1")
    store.upload(spec, models5)
    store.upload(spec, models9, doUpdate = true)
    assert(store.entries(spec.url).count() === 9)
    // idempotent: re-update adds nothing
    store.upload(spec, models9, doUpdate = true)
    assert(store.entries(spec.url).count() === 9)
  }

  test("upload without update leaves an existing namespace unchanged") {
    val store = new NamespaceStore(spark, tmpDir("ns"), () => "v1")
    store.upload(spec, models5)
    store.upload(spec, models9)
    assert(store.entries(spec.url).count() === 5)
  }

  test("drop removes the namespace and its entries") {
    val store = new NamespaceStore(spark, tmpDir("ns"), () => "v1")
    store.upload(spec, models5)
    store.drop(spec)
    assert(store.get(spec).isEmpty)
    assert(store.entries(spec.url).count() === 0)
  }

  test("A14: namespace hash is deterministic and content-sensitive") {
    val store = new NamespaceStore(spark, tmpDir("ns"))
    val h1 = store.namespaceHash(models5)
    val h2 = store.namespaceHash(models5.orderBy(org.apache.spark.sql
      .functions.col("name").desc)) // order-insensitive
    val h3 = store.namespaceHash(models9)
    assert(h1 === h2)
    assert(h1 !== h3)
    assert(h1.matches("[0-9a-f]{32}"))
  }

  test("K3: belns file has header + sorted values") {
    val s = NamespaceFiles.belns(spec, models5, useNames = true)
    assert(s.startsWith("[Namespace]\nKeyword=TEST\n"))
    assert(s.contains("[Values]\n00000|B\n11111|B"))
  }

  test("K5: mapping JSON is sorted by identifier") {
    val json = NamespaceFiles.mappingJson(models5)
    assert(json.contains("\"MODEL:0\": \"00000\""))
    assert(json.indexOf("MODEL:0") < json.indexOf("MODEL:1"))
  }

  test("K6: md5-guarded export writes once, skips unchanged, rewrites " +
    "on content change") {
    val store = new NamespaceStore(spark, tmpDir("ns"), () => "v1")
    store.upload(spec, models5)
    val dir = tmpDir("belns")
    assert(NamespaceFiles.writeDirectory(store, spec, models5, dir))
    assert(!NamespaceFiles.writeDirectory(store, spec, models5, dir))
    assert(NamespaceFiles.writeDirectory(store, spec, models9, dir))
    val belns = java.nio.file.Paths.get(dir, "test.belns")
    assert(java.nio.file.Files.exists(belns))
  }

  test("A14 at scale: order-free fingerprint is partitioning-invariant " +
    "and content-sensitive") {
    val store = new NamespaceStore(spark, tmpDir("ns"), () => "v1")
    val a = store.contentFingerprint64(models5)
    // same rows, different physical order/partitioning -> same fingerprint
    val shuffled = models5.orderBy(org.apache.spark.sql.functions.rand(7))
      .repartition(5)
    assert(store.contentFingerprint64(shuffled) === a)
    // content change -> different fingerprint
    assert(store.contentFingerprint64(models9) !== a)
    // null-named rows are excluded, matching namespaceHash's filter
    val withNull = models5.unionByName(
      Seq((null.asInstanceOf[String], null.asInstanceOf[String], "B"))
        .toDF("identifier", "name", "encoding"))
    assert(store.contentFingerprint64(withNull) === a)
  }
}

class ExportersSpec extends SparkSpec {
  import spark.implicits._

  private val edges = Seq(
    ("p(a)", "increases", "p(b)"),
    ("p(b)", "decreases", "p(c)"))
    .toDF("src", "relation", "dst")

  test("K7: nodelink export writes nodes + links JSON datasets") {
    val dir = tmpDir("nodelink")
    Exporters.nodelink(edges, dir)
    val nodes = spark.read.json(s"$dir/nodes")
    val links = spark.read.json(s"$dir/links")
    assert(nodes.count() === 3)
    assert(links.columns.sorted.toSeq === Seq("relation", "source", "target"))
    assert(links.count() === 2)
  }

  test("K8/K9/K10: edgelist, triples and gene-set TSV round-trip") {
    val dir = tmpDir("export")
    Exporters.edgelist(edges, dir)
    assert(spark.read.option("sep", " ").csv(s"$dir/edgelist").count() === 2)
    Exporters.triples(edges, s"$dir/triples")
    val trip = spark.read.option("sep", "\t").csv(s"$dir/triples")
    assert(trip.count() === 2)
    val gs = Seq(("pw1", Seq("A", "B")), ("pw2", Seq("C")))
      .toDF("identifier", "gene_set")
    Exporters.geneSetsTsv(gs, s"$dir/genesets")
    assert(spark.read.option("sep", "\t").csv(s"$dir/genesets").count() === 3)
  }
}
