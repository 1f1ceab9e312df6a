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
}
