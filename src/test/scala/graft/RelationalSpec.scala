package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object SparkTestSession {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
  val sf: String = "/root/testdata/sf0.001"
}

/** Every declared query returns rows at sf0.001, plus semantic
  * invariants for the non-obvious operators. */
class RelationalSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  // Smoke: every declared operator runs and returns rows.
  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name returns rows at sf0.001") {
      assert(fn(spark, sf).count() > 0, s"$name returned no rows")
    }
  }

  test("entry flagship returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("q15 top1: exactly one row per customer with orders") {
    import org.apache.spark.sql.functions._
    val df = relational.Breadth.q15Top1PerGroup(spark, sf)
    val nCust = Tables.orders(spark, sf).select(countDistinct(col("o_custkey")))
      .head().getLong(0)
    assert(df.count() == nCust)
    assert(df.select("o_custkey").distinct().count() == nCust)
  }

  test("q21 as-of: matched order precedes or equals event time") {
    import org.apache.spark.sql.functions._
    val matched = relational.Breadth.q21AsOfJoin(spark, sf)
    val ev = Tables.events(spark, sf).select(col("event_id"), col("ts"))
    val ord = Tables.orders(spark, sf).select(col("o_orderkey"), col("o_orderdate"))
    val bad = matched.join(ev, "event_id").join(ord, "o_orderkey")
      .filter(col("o_orderdate") > col("ts")).count()
    assert(bad == 0, s"$bad as-of matches violate o_orderdate <= ts")
  }

  test("q139 quantile sketch: estimates in-band, quantiles ordered") {
    val rows = relational.Stats.q139QuantileSketch(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("sketch_ok_p50") && r.getAs[Boolean]("sketch_ok_p95"),
        s"${r.getString(0)}: sketch out of band")
      assert(r.getAs[Double]("p50") <= r.getAs[Double]("p95"),
        s"${r.getString(0)}: p50 > p95")
    }
  }

  test("q140 pagerank: probability mass conserved, ranks dense, scores positive") {
    val rows = relational.Graph.q140PageRank(spark, sf).collect()
    val n = Tables.nation(spark, sf).count().toInt
    assert(rows.length == n)
    assert(rows.map(_.getInt(2)).sorted.toSeq == (1 to n))
    assert(rows.forall(_.getDouble(1) > 0.0))
    // dangling-mass redistribution makes each iteration conserve total
    // mass: 0.15 + 0.85·Σr = 1 (up to the decimal-sum rounding)
    val mass = rows.map(_.getDouble(1)).sum
    assert(math.abs(mass - 1.0) < 1e-5, s"rank mass $mass drifted from 1")
  }

  test("q06 outer join keeps every customer") {
    val n = Tables.customer(spark, sf).count()
    assert(relational.Core.q06OuterJoin(spark, sf).count() == n)
  }

  test("q05 anti + semi partition customers for the same predicate") {
    import org.apache.spark.sql.functions._
    val cust = Tables.customer(spark, sf)
    val open = Tables.orders(spark, sf)
      .filter(col("o_orderstatus") === "O").select("o_custkey")
    val semi = cust.join(open, cust("c_custkey") === open("o_custkey"), "left_semi").count()
    val anti = cust.join(open, cust("c_custkey") === open("o_custkey"), "left_anti").count()
    assert(semi + anti == cust.count())
  }
}
