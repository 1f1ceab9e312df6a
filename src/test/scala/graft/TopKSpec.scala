package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.TopK
import graft.plans.TopK.Ord

class TopKSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  private def windowTopK(k: Int) = {
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Tables.orders(spark, sf)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .withColumn("rn", row_number().over(w)).filter($"rn" <= k).drop("rn")
  }

  test("custom operator matches the window row_number formulation exactly") {
    val o = Tables.orders(spark, sf).select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val custom = TopK.perGroup(o, Seq("o_custkey"),
      Seq(Ord("o_totalprice", asc = false), Ord("o_orderkey")), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val viaWindow = windowTopK(3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(custom == viaWindow)
  }

  test("physical plan uses TopKPerGroupExec with a single hash exchange, no sort") {
    val o = Tables.orders(spark, sf).select($"o_custkey", $"o_orderkey", $"o_totalprice")
    val df = TopK.perGroup(o, Seq("o_custkey"), Seq(Ord("o_totalprice", asc = false)), 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"custom exec missing:\n$plan")
    assert(!plan.contains("Sort "), s"full sort should not appear:\n$plan")
    assert(plan.contains("Exchange hashpartitioning(o_custkey"),
      s"expected hash exchange on the group key:\n$plan")
  }

  test("q121 group sample: 5 per source, deterministic across runs, via the custom exec") {
    val df = graft.plans.TopK.q121GroupSample(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroup"), s"custom exec missing:\n$plan")
    val rows = df.collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.groupBy(_._1).forall(_._2.length == 5))
    // pure function of doc_id: a second run returns the identical sample
    val again = graft.plans.TopK.q121GroupSample(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == again.toSeq)
  }

  test("float group keys: -0.0 and 0.0 land in one group (normalized like SQL)") {
    // the exec identifies groups by raw UnsafeRow bytes and partitions
    // by the group exprs — without normalization the two zero sign bits
    // split one semantic group in two, diverging from PARTITION BY
    // (which normalizes floats), and k=1 would return two zero rows
    val df = Seq((0.0, 1L), (-0.0, 2L), (1.5, 3L)).toDF("g", "v")
      .repartition(2) // keep it out of ConvertToLocalRelation
    val out = TopK.perGroup(df, Seq("g"), Seq(Ord("v")), 1).collect()
    assert(out.length == 2, s"expected 2 groups, got ${out.toSeq}")
    assert(out.map(_.getLong(1)).toSet == Set(1L, 3L),
      "the merged zero group must keep its overall smallest v")
  }

  test("column resolution is case-insensitive with an ambiguity guard") {
    val df = Seq((1L, 2L)).toDF("key", "v").repartition(1)
    // default spark.sql.caseSensitive=false: KEY resolves like any
    // other Spark API
    assert(TopK.perGroup(df, Seq("KEY"), Seq(Ord("V")), 1).count() == 1)
    val dup = df.select($"key", $"v".as("key"))
    val e = intercept[IllegalArgumentException] {
      TopK.perGroup(dup, Seq("key"), Seq(Ord("key")), 1)
    }
    assert(e.getMessage.contains("ambiguous"))
  }

  test("empty groupBy is rejected with a usable message") {
    val df = Seq((1L, 2L)).toDF("key", "v")
    val e = intercept[IllegalArgumentException] {
      TopK.perGroup(df, Seq.empty, Seq(Ord("v")), 1)
    }
    assert(e.getMessage.contains("orderBy(...).limit(k)"))
  }

  test("k larger than any group returns everything") {
    val o = Tables.orders(spark, sf).select($"o_custkey", $"o_orderkey")
    val all = TopK.perGroup(o, Seq("o_custkey"), Seq(Ord("o_orderkey")), 1000000).count()
    assert(all == o.count())
  }

  test("k=1 picks the scheduler top-1 (S8 semantics)") {
    val o = Tables.orders(spark, sf).select($"o_custkey", $"o_orderkey", $"o_orderdate")
    val top1 = TopK.perGroup(o, Seq("o_custkey"),
      Seq(Ord("o_orderdate"), Ord("o_orderkey")), 1)
    assert(top1.count() == o.select($"o_custkey").distinct().count())
  }

  // ---- SQL front door: the graft_topk table function ----

  test("q127 SQL-text front door plans through TopKPerGroupExec and matches the Scala path") {
    val viaSql = plans.TopK.q127TopkSql(spark, sf)
    val planStr = viaSql.queryExecution.executedPlan.toString
    assert(planStr.contains("TopKPerGroup"), planStr.take(2000))
    assert(!planStr.contains("Window"),
      "the TVF must reach the native exec, not the window formulation")
    assert(viaSql.collect().toSeq == plans.TopK.q86CustomTopk(spark, sf).collect().toSeq)
  }

  test("graft_topk rejects a malformed order spec and a non-integer k") {
    plans.GraftTableFunctions.register(spark)
    Seq((1L, 2L)).toDF("g", "v").createOrReplaceTempView("graft_topk_args_t")
    val badSpec = intercept[Exception] {
      spark.sql("SELECT * FROM graft_topk('graft_topk_args_t', 1, 'g', 'v sideways')")
        .collect()
    }
    assert(badSpec.getMessage.contains("asc|desc"), badSpec.getMessage)
    val badK = intercept[Exception] {
      spark.sql("SELECT * FROM graft_topk('graft_topk_args_t', 'one', 'g', 'v')")
        .collect()
    }
    assert(badK.getMessage.contains("integer"), badK.getMessage)
    // k=0 reaches the operator's own positive-k contract
    val zeroK = intercept[Exception] {
      spark.sql("SELECT * FROM graft_topk('graft_topk_args_t', 0, 'g', 'v')")
        .collect()
    }
    assert(zeroK.getMessage.contains("positive"), zeroK.getMessage)
  }
}
