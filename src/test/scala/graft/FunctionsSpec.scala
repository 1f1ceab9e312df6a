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

  test("FoldSelfCosine rule rewrites graft_cosine(x,x) to literal 1.0") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ FoldSelfCosine
    try {
      val df = Tables.embeddings(spark, sf)
        .select(transform($"embedding", x => x.cast("double")).as("v"))
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

  test("FoldSelfCosine leaves distinct arguments alone") {
    val plan = spark.range(1)
      .select(CosineSim.cosine(spark,
        array(lit(1.0), lit(0.0)), array(lit(0.0), lit(1.0))).as("c"))
      .queryExecution.analyzed
    assert(FoldSelfCosine(plan).toString.contains("graft_cosine"))
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
