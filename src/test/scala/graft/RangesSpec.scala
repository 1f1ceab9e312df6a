package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Range-join operator pins: the bucket decomposition must (a) plan an
  * equi-join, never a nested-loop, and (b) return EXACTLY the rows the
  * naive theta join defines — the exactly-once accounting (single
  * bucket per point; anchor bucket per interval pair) is the part a
  * refactor could silently break, so both queries are checked row-set
  * equal against the direct formulation on the same session. */
class RangesSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._
  import relational.Ranges

  test("q174 plans an equi-join on the bucket, not a nested loop") {
    val plan = Ranges.q174RangeJoin(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"),
      s"range join fell back to a nested loop:\n$plan")
  }

  test("q174 point-in-interval matches the direct theta join") {
    val wins = Ranges.activeWindows(spark, sf)
    val errs = Tables.events(spark, sf).filter($"event_type" === "error")
      .select($"user_id".as("e_user"),
        unix_micros($"ts".cast("timestamp")).as("tu"), $"value")
    // naive formulation: the definition, cost be damned (test-only)
    val direct = wins.join(errs,
        $"tu" >= $"au" && $"tu" < $"bu" && $"e_user" =!= wins("user_id"), "left")
      .groupBy($"user_id", $"sess_id")
      .agg(count($"tu").as("n_err"),
        coalesce(round(relational.dsum($"value"), 2), lit(0.0)).as("err_value"))
      .select($"user_id", $"sess_id", $"n_err", $"err_value")
    val got = Ranges.q174RangeJoin(spark, sf)
      .select($"user_id", $"sess_id", $"n_err", $"err_value")
    assert(got.collect().toSet === direct.collect().toSet)
    // and some session actually saw cross-user errors, or the test is vacuous
    assert(got.filter($"n_err" > 0).count() > 0)
  }

  test("q175 interval-overlap matches the direct theta join (exactly-once anchor)") {
    val wins = Ranges.activeWindows(spark, sf)
    val p = wins.filter($"has_purchase" === 1)
      .select($"user_id".as("buyer_id"), $"au".as("p_au"), $"bu".as("p_bu"))
    val o = wins.select($"user_id".as("other_id"), $"au".as("o_au"), $"bu".as("o_bu"))
    val direct = p.join(o,
        $"buyer_id" =!= $"other_id" && $"p_au" < $"o_bu" && $"o_au" < $"p_bu")
      .select($"buyer_id", $"other_id",
        (least($"p_bu", $"o_bu") - greatest($"p_au", $"o_au")).as("ov"))
      .groupBy($"buyer_id", $"other_id")
      .agg(count(lit(1)).as("n_overlaps"), sum($"ov").as("overlap_us"))
    val directTop = direct
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy($"overlap_us".desc, $"buyer_id".asc, $"other_id".asc)))
      .filter($"rk" <= 20)
      .select($"rk", $"buyer_id", $"other_id", $"n_overlaps", $"overlap_us")
    val got = Ranges.q175IntervalOverlap(spark, sf)
    assert(got.collect().toSet === directTop.collect().toSet)
  }

  test("q204 SQL front door returns exactly q174's rows") {
    val a = Ranges.q204RangeJoinSql(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getDouble(5))).toSet
    val b = Ranges.q174RangeJoin(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4), r.getDouble(5))).toSet
    assert(a === b, "SQL-text range join diverged from the DataFrame form")
  }

  test("q175 overlap lengths are positive and bounded by the shorter window") {
    val wins = Ranges.activeWindows(spark, sf)
      .select($"au", $"bu", ($"bu" - $"au").as("len"))
    val maxLen = wins.agg(max($"len")).as[Long].head()
    val ovs = Ranges.q175IntervalOverlap(spark, sf)
      .select($"overlap_us", $"n_overlaps").collect()
    ovs.foreach { r =>
      val ov = r.getLong(0); val n = r.getLong(1)
      assert(ov > 0 && ov <= n * maxLen,
        s"overlap_us=$ov outside (0, n=$n * maxLen=$maxLen]")
    }
  }
}
