package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{CosineSim, FoldSelfCosine, SimhashAgg}
import graft.llm.Dedup

class FunctionsSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  test("GraftExtensions installs the optimizer rule and both planner strategies") {
    import org.apache.spark.sql.graftshim.GraftSqlShim
    val e = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(e)
    val strategies = GraftSqlShim.plannerStrategies(e, spark)
    assert(strategies.contains(graft.plans.TopKStrategy))
    assert(strategies.contains(graft.plans.AsOfStrategy))
    assert(GraftSqlShim.optimizerRules(e, spark).contains(FoldSelfCosine))
  }

  test("extensions-built session plans AsOf.join without touching experimental") {
    import org.apache.spark.sql.graftshim.GraftSqlShim
    val s2 = GraftSqlShim.sessionWithExtensions(
      spark, new graft.functions.GraftExtensions().apply(_),
      Map("spark.sql.shuffle.partitions" -> "4",
          "spark.sql.session.timeZone" -> "UTC"))
    import s2.implicits._
    val l = Seq((1L, 10L), (1L, 20L)).toDF("k", "t")
    val r = Seq((1L, 5L, "a"), (1L, 15L, "b")).toDF("k2", "t2", "v")
    val joined = graft.plans.AsOf.join(l, r,
      Seq("k"), Seq("k2"), "t", "t2")
    assert(s2.experimental.extraStrategies.isEmpty,
      "extensions session must not grow an experimental entry")
    assert(joined.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      joined.queryExecution.executedPlan.toString)
    assert(joined.select($"t", $"v").collect().map(x => (x.getLong(0), x.getString(1)))
      .toSet == Set((10L, "a"), (20L, "b")))
    // (the experimental-fallback entry style is exercised end-to-end by
    // AsOfJoinSpec on the plain shared session)
  }

  test("extensions-built session resolves graft_cosine from pure SQL text") {
    import org.apache.spark.sql.graftshim.GraftSqlShim
    val s2 = GraftSqlShim.sessionWithExtensions(
      spark, new graft.functions.GraftExtensions().apply(_),
      Map("spark.sql.shuffle.partitions" -> "4"))
    // no CosineSim.register / cosine() call on s2 — the injectFunction
    // entry alone must make the SQL text resolve
    val got = s2.sql(
      "SELECT graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c")
      .collect().head.getDouble(0)
    assert(got == 1.0)
    // arity errors surface at analysis with the function's own message
    val err = intercept[Exception] {
      s2.sql("SELECT graft_cosine(array(1.0D))").collect()
    }
    assert(err.getMessage.contains("2 arguments"), err.getMessage)
    // the plain shared session is untouched by s2's registry: the
    // fallback path (register) still governs it
    graft.functions.CosineSim.register(spark)
    assert(spark.sql(
      "SELECT graft_cosine(array(0.0D, 2.0D), array(0.0D, 1.0D)) AS c")
      .collect().head.getDouble(0) == 1.0)
  }

  test("extensions-built session resolves the graft_topk/graft_asof TVFs from pure SQL text") {
    import org.apache.spark.sql.graftshim.GraftSqlShim
    val s2 = GraftSqlShim.sessionWithExtensions(
      spark, new graft.functions.GraftExtensions().apply(_),
      Map("spark.sql.shuffle.partitions" -> "4"))
    import s2.implicits._
    // no GraftTableFunctions.register on s2 — injectTableFunction alone
    // must make the text resolve, and the injected strategies must plan it
    Seq((1L, 10L), (1L, 20L), (2L, 5L)).toDF("g", "v")
      .createOrReplaceTempView("graft_ext_tvf_t")
    val top = s2.sql(
      "SELECT g, v FROM graft_topk('graft_ext_tvf_t', 1, 'g', 'v desc') ORDER BY g")
    assert(top.queryExecution.executedPlan.toString.contains("TopKPerGroup"))
    assert(top.collect().map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 20L), (2L, 5L)))
    assert(s2.experimental.extraStrategies.isEmpty,
      "extensions session must not grow an experimental entry")
  }

  test("FoldSelfCosine rule folds graft_cosine(x,x) away") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ FoldSelfCosine
    try {
      // coalesce makes the element type provably non-null — the rule
      // requires containsNull=false (parquet list elements are nullable
      // by default, and on a nullable slot the fold and the raw
      // expression diverge; see the guard's scaladoc)
      val df = Tables.embeddings(spark, sf)
        .select(transform($"embedding",
          x => coalesce(x.cast("double"), lit(0.0))).as("v"))
        .select(CosineSim.cosine(spark, $"v", $"v").as("c"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("graft_cosine"),
        s"rule did not fire:\n$optimized")
      assert(df.distinct().collect().map(_.getDouble(0)).toSeq == Seq(1.0))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == FoldSelfCosine)
    }
  }

  test("FoldSelfCosine declines arrays with nullable elements") {
    // transform over a parquet-sourced array keeps containsNull=true;
    // the rewrite's ArrayExists path and CosineSim's getDouble on a
    // null slot disagree there, so the rule must leave the expression
    // in place rather than change what those inputs produce
    val plan = Tables.embeddings(spark, sf)
      .select(transform($"embedding", x => x.cast("double")).as("v"))
      .select(CosineSim.cosine(spark, $"v", $"v").as("c"))
      .queryExecution.analyzed
    assert(FoldSelfCosine(plan).toString.contains("graft_cosine"),
      "rule must not rewrite a containsNull=true array")
  }

  test("FoldSelfCosine preserves NULL and zero-vector semantics") {
    // The unoptimized expression returns NULL for a NULL vector
    // (BinaryExpression null-intolerance) and 0.0 for a zero/empty
    // vector (guarded denominator). An optimizer rule must not change
    // results, so the fold must reproduce both — a bare literal 1.0
    // would turn these rows into false self-similarity.
    val rows = Seq(
      (1L, Some(Seq(3.0, 4.0))),    // exact norm (5.0): bit-parity case
      (2L, Some(Seq(0.5, -0.25))),  // inexact norm: computed path is 1±ulp
      (3L, Some(Seq(0.0, 0.0))),    // zero vector
      (4L, None),                   // NULL vector
      (5L, Some(Seq.empty[Double]))) // empty vector
    // repartition keeps the source out of ConvertToLocalRelation's
    // reach — over a bare local Seq that rule computes the projection
    // EAGERLY (before extraOptimizations), so the fold would never run
    // and the plan assertion would pass vacuously on a LocalRelation
    def src = rows.toDF("id", "v").repartition(1)
    val df = src
      .select($"id", CosineSim.cosine(spark, $"v", $"v").as("c"))
    val unopt = df.collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ FoldSelfCosine
    try {
      val folded = src
        .select($"id", CosineSim.cosine(spark, $"v", $"v").as("c"))
      assert(!folded.queryExecution.optimizedPlan.toString.contains("graft_cosine"))
      val opt = folded.collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getDouble(1))).toMap
      // NULL / zero / empty must fold EXACTLY; the nonzero branch folds
      // to true 1.0, within 1 ULP of the computed dot/(√n·√n)
      assert(opt(1L) == 1.0 && unopt(1L) == 1.0)
      assert(opt(2L) == 1.0 &&
        math.abs(unopt(2L).asInstanceOf[Double] - 1.0) < 1e-12)
      assert(opt(3L) == 0.0 && unopt(3L) == 0.0)
      assert(opt(4L) == null && unopt(4L) == null)
      assert(opt(5L) == 0.0 && unopt(5L) == 0.0)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == FoldSelfCosine)
    }
  }

  test("FoldSelfCosine leaves distinct arguments alone") {
    val plan = spark.range(1)
      .select(CosineSim.cosine(spark,
        array(lit(1.0), lit(0.0)), array(lit(0.0), lit(1.0))).as("c"))
      .queryExecution.analyzed
    assert(FoldSelfCosine(plan).toString.contains("graft_cosine"))
  }

  test("SortedOverlapCount equals size(array_intersect) on sorted distinct arrays") {
    import graft.functions.SortedOverlapCount
    // randomized-but-deterministic corpus: token sets of varied overlap
    val rows = (0 until 200).map { i =>
      val a = (0 until 20).map(k => s"t${(i * 7 + k * 3) % 60}").distinct
      val b = (0 until 25).map(k => s"t${(i * 11 + k * 5) % 60}").distinct
      (i.toLong, a, b)
    }
    val df = rows.toDF("id", "a", "b")
      .select($"id",
        array_sort(array_distinct($"a")).as("sa"),
        array_sort(array_distinct($"b")).as("sb"))
    val got = df.select($"id",
        SortedOverlapCount.overlap(spark, $"sa", $"sb").as("o"),
        size(array_intersect($"sa", $"sb")).as("ref"))
      .collect()
    got.foreach(r => assert(r.getInt(1) == r.getInt(2), s"id=${r.getLong(0)}"))
    assert(got.exists(_.getInt(1) > 0) && got.exists(r => r.getInt(1) < 20))
    // null-intolerance: null ARRAY → null out (BinaryExpression), but a
    // null ELEMENT is corruption and must error
    val withNullArr = Seq((1L, null.asInstanceOf[Seq[String]], Seq("x")))
      .toDF("id", "a", "b")
    assert(withNullArr.select(SortedOverlapCount.overlap(spark, $"a", $"b"))
      .collect().head.isNullAt(0))
    // the guard fires on VISITED slots — pair the null against a
    // longer other side so the merge reaches it
    val withNullElem = Seq((1L, Seq("a", null), Seq("a", "b"))).toDF("id", "a", "b")
      // repartition keeps ConvertToLocalRelation from folding the
      // projection before the assertion can observe the throw
      .repartition(1)
    val e = intercept[Exception] {
      withNullElem.select(SortedOverlapCount.overlap(spark, $"a", $"b")).collect()
    }
    assert(e.getMessage != null)
    // analysis-time type check
    val typeErr = intercept[Exception] {
      spark.range(1).select(SortedOverlapCount.overlap(spark,
        array(lit(1), lit(2)), array(lit("x")))).collect()
    }
    assert(typeErr.getMessage.contains("array<string>"), typeErr.getMessage)
    // SQL front door via the extensions-built session
    import org.apache.spark.sql.graftshim.GraftSqlShim
    val s2 = GraftSqlShim.sessionWithExtensions(
      spark, new graft.functions.GraftExtensions().apply(_), Map.empty)
    assert(s2.sql(
      "SELECT graft_sorted_overlap(array('a','b','c'), array('b','c','d')) AS o")
      .collect().head.getInt(0) == 2)
  }

  test("SimhashAgg aggregator matches the column-wise simhash64 bit-for-bit") {
    val docs = Tables.documents(spark, sf).limit(50)
      .select($"doc_id", regexp_extract_all(lower($"text"), lit("\\S+"), lit(0)).as("toks"))
    val colWise = Dedup.simhash64(docs, "doc_id", "toks")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaAgg = docs
      .select($"doc_id", explode($"toks").as("tok"))
      .select($"doc_id", xxhash64($"tok").as("h"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(SimhashAgg.toColumn)
      .collect().toMap
    assert(viaAgg == colWise)
  }

  test("graft_simhash resolves from SQL text on both registration paths") {
    // extensions-built session: injectFunction alone must resolve the
    // UDAF from text, and the plan must aggregate through the
    // ScalaAggregator (the Aggregator tier, not a rewrite to something
    // else) — the same plan-shape discipline as the TVF asserts
    import org.apache.spark.sql.graftshim.GraftSqlShim
    val s2 = GraftSqlShim.sessionWithExtensions(
      spark, new graft.functions.GraftExtensions().apply(_),
      Map("spark.sql.shuffle.partitions" -> "4"))
    val data = Seq((1L, 1L), (1L, 2L), (2L, 3L))
    s2.createDataFrame(data).toDF("g", "h")
      .createOrReplaceTempView("graft_simhash_ext_t")
    val viaExt = s2.sql(
      "SELECT g, graft_simhash(h) AS sh FROM graft_simhash_ext_t GROUP BY g ORDER BY g")
    assert(viaExt.queryExecution.executedPlan.toString.contains("simhash"),
      viaExt.queryExecution.executedPlan.toString)
    val extRows = viaExt.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // group 2 = single hash 3: bits 0,1 voted +1, all others -1 => 3L
    assert(extRows(2L) == 3L)
    // call-time registration on the shared session gives the same result
    graft.functions.SimhashAgg.register(spark)
    spark.createDataFrame(data).toDF("g", "h")
      .createOrReplaceTempView("graft_simhash_reg_t")
    val viaReg = spark.sql(
      "SELECT g, graft_simhash(h) AS sh FROM graft_simhash_reg_t GROUP BY g ORDER BY g")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(viaReg == extRows)
    // ... and both equal the typed Aggregator applied directly
    val typed = data.toDS()
      .groupByKey(_._1).mapValues(_._2).agg(SimhashAgg.toColumn)
      .collect().toMap
    assert(typed == extRows)
    // SQL NULL convention: a NULL hash is SKIPPED, not decoded to 0 and
    // allowed to vote all 64 bits down (the primitive-encoder trap —
    // group (1, NULL) must keep signature 1); a group with no non-null
    // inputs yields NULL like sum/avg
    val nullRows = spark.sql(
      """SELECT g, graft_simhash(h) AS sh FROM VALUES
        |  (1, CAST(1 AS BIGINT)), (1, CAST(NULL AS BIGINT)),
        |  (2, CAST(NULL AS BIGINT)) AS t(g, h)
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(nullRows(0).getLong(1) == 1L, "NULL input must not vote")
    assert(nullRows(1).isNullAt(1), "an all-NULL group must yield NULL")
  }

  test("q66 IVF ANN: runs, respects rank bounds, positive recall") {
    val brute = graft.llm.Similarity.q36CosineTopk(spark, sf)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = graft.llm.Similarity.q66AnnIvf(spark, sf)
    val rows = ivf.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getInt(1) <= 5))
    val pairs = rows.map(r => (r.getLong(0), r.getLong(2))).toSet
    val recall = (pairs & brute).size.toDouble / brute.size
    info(f"IVF recall vs brute force: $recall%.2f")
    assert(recall > 0.05)
  }
}
