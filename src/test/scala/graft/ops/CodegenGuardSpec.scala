package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnShim

import graft.SparkSpec
import graft.functions.Vectors

/** Every native kernel must stay inside whole-stage codegen at production
  * parameter sizes — a kernel that silently trips into interpreted
  * `CodegenFallback` (e.g. generated code past Janino limits at a large
  * nList / bit count) would drop the hot path out of Tungsten exactly where
  * the 100 TB corpus pays for it. Two checks per kernel: the expression
  * type itself is not a CodegenFallback, and an executed plan places the
  * kernel's projection inside a WholeStageCodegen span. */
class CodegenGuardSpec extends SparkSpec {
  import spark.implicits._

  // parquet-backed (a plain local Seq would be folded into a
  // LocalTableScan by ConvertToLocalRelation, leaving no codegen span
  // to inspect — the opposite of the production scan shape)
  private lazy val vecs: DataFrame = {
    val p = s"${tmpDir("cg_vecs")}/v"
    (0 until 64).map(i => (i.toLong,
      Array.tabulate(16)(j => math.sin(i * 17 + j).toFloat)))
      .toDF("vec_id", "embedding").write.parquet(p)
    spark.read.parquet(p)
  }

  private lazy val docs: DataFrame = {
    val p = s"${tmpDir("cg_docs")}/d"
    (0 until 64).map(i => (i.toLong, s"alpha beta gamma delta $i epsilon"))
      .toDF("doc_id", "text").write.parquet(p)
    spark.read.parquet(p)
  }

  /** Execute and require that some WholeStageCodegen subtree contains the
    * kernel (visible by its prettyName in the span's plan string). */
  private def assertCodegenSpan(df: DataFrame, kernel: String): Unit = {
    df.collect()
    val executed = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val spans = executed.collect { case w: WholeStageCodegenExec => w }
    assert(spans.exists(_.toString.contains(kernel)),
      s"$kernel not inside any WholeStageCodegen span:\n$executed")
  }

  test("NearestCells at nList=512 codegens (no fallback)") {
    val cellIds = (0L until 512L).toSeq
    val cents = Seq.tabulate(512)(c =>
      Seq.tabulate(16)(j => math.cos(c * 31 + j)))
    val col512 = Similarity.cellsOfCol(col("embedding"), cellIds, cents, 4)
    assert(!ColumnShim.expression(col512).isInstanceOf[CodegenFallback])
    assertCodegenSpan(vecs.select(col("vec_id"), col512.as("cells")),
      "graft_nearest_cells")
  }

  test("HyperplaneBands at 256 total bits codegens (no fallback)") {
    val c = Vectors.hyperplaneBands(col("embedding"), 16, 16)
    assert(!ColumnShim.expression(c).isInstanceOf[CodegenFallback])
    assertCodegenSpan(vecs.select(col("vec_id"), c.as("bands")),
      "graft_hyperplane_bands")
  }

  test("WordShingleHashes codegens (no fallback)") {
    val c = TextAnalysis.wordShingleHashes(col("text"), 3)
    assert(!ColumnShim.expression(c).isInstanceOf[CodegenFallback])
    assertCodegenSpan(docs.select(col("doc_id"), c.as("sh")),
      "graft_word_shingle_hashes")
  }

  test("MinHashSig at 128 hashes codegens (no fallback)") {
    val c = Dedup.minHashSignature(
      TextAnalysis.wordShingleHashes(col("text"), 3), 128)
    assert(!ColumnShim.expression(c).isInstanceOf[CodegenFallback])
    assertCodegenSpan(docs.select(col("doc_id"), c.as("sig")),
      "graft_minhash_sig")
  }

  test("CosineSimilarity codegens (no fallback)") {
    val c = Vectors.cosine(col("embedding"), col("embedding"))
    assert(!ColumnShim.expression(c).isInstanceOf[CodegenFallback])
    assertCodegenSpan(vecs.select(col("vec_id"), c.as("cos")),
      "graft_cosine")
  }

  test("AdcScore codegens (no fallback)") {
    val cb = ProductQuantization.train(vecs, m = 4, k = 8, iterations = 2,
      sampleSize = 64)
    val coded = {
      val p = s"${tmpDir("cg_adc")}/c"
      vecs.select(col("vec_id"),
        ProductQuantization.codesCol(col("embedding"), cb).as("codes"))
        .withColumn("dtab", typedlit(Seq.fill(4)(Seq.fill(8)(0.5))))
        .write.parquet(p)
      spark.read.parquet(p)
    }
    val c = {
      import org.apache.spark.sql.graft.ColumnShim
      ColumnShim.column(graft.functions.AdcScore(
        ColumnShim.expression(col("codes")),
        ColumnShim.expression(col("dtab"))))
    }
    assert(!ColumnShim.expression(c).isInstanceOf[CodegenFallback])
    assertCodegenSpan(coded.select(col("vec_id"), c.as("adc")),
      "graft_adc_score")
  }

  test("Winnow codegens (no fallback)") {
    val c = TextAnalysis.winnowFingerprints(col("text"))
    assert(!ColumnShim.expression(c).isInstanceOf[CodegenFallback])
    assertCodegenSpan(docs.select(col("doc_id"), c.as("fp")),
      "graft_winnow")
  }

  test("RepetitionStats codegens (no fallback)") {
    val c = ColumnShim.column(graft.functions.RepetitionStatsExpr(
      ColumnShim.expression(col("text"))))
    assert(!ColumnShim.expression(c).isInstanceOf[CodegenFallback])
    assertCodegenSpan(docs.select(col("doc_id"), c.as("rep")),
      "graft_repetition_stats")
  }

  test("SimHash over native shingle hashes codegens (no fallback)") {
    val c = Dedup.simHash(
      graft.ops.TextAnalysis.wordShingleHashes(col("text"), 3))
    assert(!ColumnShim.expression(c).isInstanceOf[CodegenFallback])
    assertCodegenSpan(docs.select(col("doc_id"), c.as("sh")),
      "graft_simhash")
  }

  test("PQ encode is one narrow codegen'd pass; ADC joins broadcast only") {
    val cb = ProductQuantization.train(vecs, m = 4, k = 8, iterations = 2,
      sampleSize = 64)
    // encode: NearestCells per subspace inside a codegen span, no shuffle
    val enc = ProductQuantization.encode(vecs, cb)
    assertCodegenSpan(enc, "graft_nearest_cells")
    assert(!enc.queryExecution.executedPlan.toString.contains("Exchange"),
      "PQ encode must not shuffle")
    // ADC scoring: the only joins are broadcast (tables + candidates +
    // query vectors) — no shuffle of the corpus
    val queries = vecs.limit(4)
      .select(col("vec_id").as("query_id"), col("embedding"))
    val top = ProductQuantization.adcTopK(vecs, cb, queries, k = 2,
      rerankFrom = 8)
    top.collect()
    val plan = top.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"),
      s"ADC plan must join via broadcast only:\n$plan")
  }

  test("CentroidScoreExpr at 64 labels x 64 dims codegens (no fallback)") {
    // production label-count × dim — the shape whose HOF form paid
    // L·d interpreted lambda dispatches per row; the kernel's plan
    // size is O(1) in L·d (one reference object), pinned here
    val L = 64; val d = 64
    val p = s"${tmpDir("cg_cent")}/v"
    (0 until 64).map(i => (i.toLong,
      Array.tabulate(d)(j => math.sin(i * 17 + j).toFloat)))
      .toDF("vec_id", "embedding").write.parquet(p)
    val wide = spark.read.parquet(p)
    val expr = graft.functions.CentroidScoreExpr(
      ColumnShim.expression(col("embedding")),
      labels = Seq.tabulate(L)(identity),
      counts = Seq.tabulate(L)(l => (l + 3).toLong),
      sFlat = Seq.tabulate(L * d)(i => (i % 97).toLong - 48),
      scale = 100000L)
    assert(!expr.isInstanceOf[CodegenFallback])
    assertCodegenSpan(
      wide.select(col("vec_id"), ColumnShim.column(expr).as("pred")),
      "graft_centroid_score")
  }

  test("AffineProjectExpr at d=16 k=16 codegens (no fallback)") {
    val d = 16
    val expr = graft.functions.AffineProjectExpr(
      ColumnShim.expression(col("embedding")),
      Seq.tabulate(d)(_ * 0.01),
      Seq.tabulate(d * d)(i => math.sin(i)),
      Seq.fill(d)(1.0))
    assert(!expr.isInstanceOf[CodegenFallback])
    assertCodegenSpan(
      vecs.select(col("vec_id"), ColumnShim.column(expr).as("proj")),
      "graft_affine_project")
  }
}
