package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Relational breadth (SURVEY.md §2.2 rows: scalar functions, grouping
  * sets/cube, distinct aggregation, correlated predicates, range and
  * as-of joins, self-join dependency detection).
  *
  * Scale notes: the self-join (q19) and range join (q20) keep an equality
  * conjunct so Catalyst plans a hash/sort-merge join with the range as a
  * post-filter — never a cartesian. The as-of join (q21) is the
  * join+window formulation (shuffle on the equality key, then one
  * window pass) which scales linearly in matched pairs; Spark has no
  * native as-of join (SURVEY.md §7.3).
  */
object Breadth {

  /** q11: cube — all grouping-set combinations (status × priority), the
    * status-overview matrix S18 (ref `commands/pulse.md:27-61`). */
  def q11Cube(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"), round(dsum($"o_totalprice"), 2).as("total"))
      .select(coalesce($"o_orderstatus", lit("ALL")).as("o_orderstatus"),
        coalesce($"o_orderpriority", lit("ALL")).as("o_orderpriority"),
        $"n", $"total")
      .orderBy($"o_orderstatus", $"o_orderpriority")
  }

  val q11Sql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
      |       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
      |       count(*) AS n, round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS total
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  /** q12: string scalar functions — the plan-field-extraction surface S4
    * (ref `agents/orbiter.md:47-53`): regex extract, case, length,
    * concat, substring. */
  def q12StringFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.part(s, dir)
      .select(
        $"p_partkey",
        upper($"p_brand").as("brand_u"),
        regexp_extract($"p_type", "^(\\w+)", 1).as("type_head"),
        length($"p_name").as("name_len"),
        concat_ws("|", $"p_brand", $"p_type").as("brand_type"),
        substring($"p_name", 1, 8).as("name_pfx"))
      .orderBy($"p_partkey")
  }

  val q12Sql: String =
    """SELECT p_partkey,
      |  upper(p_brand) AS brand_u,
      |  regexp_extract(p_type, '^(\w+)', 1) AS type_head,
      |  CAST(length(p_name) AS INT) AS name_len,
      |  concat_ws('|', p_brand, p_type) AS brand_type,
      |  substring(p_name, 1, 8) AS name_pfx
      |FROM part ORDER BY p_partkey""".stripMargin

  /** q13: date/time scalar functions — ISO parse/compare/age surface
    * (ref `commands/pulse.md:88`, `hooks/status-tracker.sh:153`):
    * truncation, extraction, day arithmetic. */
  def q13DateFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy(date_trunc("month", $"o_orderdate").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        round(dsum($"o_totalprice") / count(lit(1)), 2).as("avg_price"))
      .withColumn("yr", year($"month"))
      .withColumn("mon", month($"month"))
      .select($"month", $"yr", $"mon", $"n_orders", $"avg_price")
      .orderBy($"month")
  }

  // DuckDB's date_trunc('month', ts) yields DATE; cast back to TIMESTAMP
  // to match Spark's TimestampNTZ output.
  val q13Sql: String =
    """SELECT mo AS month, CAST(year(mo) AS INT) AS yr, CAST(month(mo) AS INT) AS mon,
      |       n_orders, avg_price
      |FROM (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mo,
      |         count(*) AS n_orders, round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*), 2) AS avg_price
      |  FROM orders GROUP BY 1) t
      |ORDER BY month""".stripMargin

  /** q14: CASE-based priority assignment — the scheduler's priority map S7
    * verbatim shape (ref `agents/orbiter.md:67-84`): base priority from
    * order priority class, −1 boost for big spenders, floor at 1. */
  def q14CasePriority(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.orders(s, dir).select(
      $"o_orderkey",
      when($"o_orderpriority" === "1-URGENT", 1)
        .when($"o_orderpriority" === "2-HIGH", 2)
        .when($"o_orderpriority" === "3-MEDIUM", 3)
        .when($"o_orderpriority" === "4-NOT SPECIFIED", 4)
        .otherwise(5).as("base_prio"),
      when($"o_totalprice" > 200000.0, -1).otherwise(0).as("adj"))
    base.select($"o_orderkey",
        greatest(($"base_prio" + $"adj"), lit(1)).as("priority"))
      .groupBy($"priority").agg(count(lit(1)).as("n"))
      .orderBy($"priority")
  }

  val q14Sql: String =
    """SELECT priority, count(*) AS n FROM (
      |  SELECT greatest(
      |    CASE o_orderpriority
      |      WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
      |      WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
      |      ELSE 5 END
      |    + CASE WHEN o_totalprice > 200000.0 THEN -1 ELSE 0 END, 1) AS priority
      |  FROM orders) t
      |GROUP BY priority ORDER BY priority""".stripMargin

  /** q15: scheduler top-1 select S8 (ref `agents/orbiter.md:85-90`): per
    * customer, the single highest-priority oldest order; ties broken by
    * key — exactly the reference's "priority ASC, createdAt ASC, oldest
    * wins" rule. */
  def q15Top1PerGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val prio = Tables.orders(s, dir).select(
      $"o_custkey", $"o_orderkey", $"o_orderdate",
      when($"o_orderpriority" === "1-URGENT", 1)
        .when($"o_orderpriority" === "2-HIGH", 2)
        .when($"o_orderpriority" === "3-MEDIUM", 3)
        .when($"o_orderpriority" === "4-NOT SPECIFIED", 4)
        .otherwise(5).as("priority"))
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"priority".asc, $"o_orderdate".asc, $"o_orderkey".asc)
    prio.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"o_custkey", $"o_orderkey", $"priority")
      .orderBy($"o_custkey")
  }

  val q15Sql: String =
    """SELECT o_custkey, o_orderkey, priority FROM (
      |  SELECT o_custkey, o_orderkey,
      |    CASE o_orderpriority
      |      WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
      |      WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
      |      ELSE 5 END AS priority,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY (CASE o_orderpriority
      |        WHEN '1-URGENT' THEN 1 WHEN '2-HIGH' THEN 2
      |        WHEN '3-MEDIUM' THEN 3 WHEN '4-NOT SPECIFIED' THEN 4
      |        ELSE 5 END) ASC, o_orderdate ASC, o_orderkey ASC) AS rn
      |  FROM orders) t
      |WHERE rn = 1 ORDER BY o_custkey""".stripMargin

  /** q16: correlated predicate — orders above their own customer's average
    * (decorrelated to an aggregate join, which is what Catalyst and
    * DuckDB both do under the hood). */
  def q16Correlated(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    // decimal-sum average (dsum rule): the threshold gates row
    // membership, so it must be accumulation-order-independent — a
    // plain double avg can differ between engines by a few ulps and
    // flip rows near the boundary (same class as q79)
    val avgPerCust = o.groupBy($"o_custkey".as("ck"))
      .agg((dsum($"o_totalprice") / count(lit(1))).as("avg_price"))
    o.join(avgPerCust, $"o_custkey" === $"ck")
      .filter($"o_totalprice" > $"avg_price" * 1.5)
      .select($"o_orderkey", $"o_custkey")
      .orderBy($"o_orderkey")
  }

  val q16Sql: String =
    """SELECT o_orderkey, o_custkey FROM orders o
      |WHERE o_totalprice > 1.5 * (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
      |                                   / count(*) FROM orders i
      |                            WHERE i.o_custkey = o.o_custkey)
      |ORDER BY o_orderkey""".stripMargin

  /** q17: distinct aggregation (count of distinct plans/projects per
    * queue — S2 variants, ref `scripts/starry-daemon.sh:105-115`). */
  def q17Distinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .groupBy($"c_mktsegment")
      .agg(countDistinct($"c_nationkey").as("n_nations"),
        count(lit(1)).as("n_cust"),
        round(min($"c_acctbal"), 2).as("min_bal"),
        round(max($"c_acctbal"), 2).as("max_bal"))
      .orderBy($"c_mktsegment")
  }

  val q17Sql: String =
    """SELECT c_mktsegment, count(DISTINCT c_nationkey) AS n_nations,
      |  count(*) AS n_cust, round(min(c_acctbal), 2) AS min_bal,
      |  round(max(c_acctbal), 2) AS max_bal
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q18: HAVING — post-aggregation predicate (queue-threshold gating,
    * ref `scripts/starry-daemon.sh:182-185`). */
  def q18Having(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_suppkey")
      .agg(count(lit(1)).as("n"), round(dsum($"l_extendedprice"), 2).as("volume"))
      .filter($"n" > 500)
      .orderBy($"l_suppkey")
  }

  val q18Sql: String =
    """SELECT l_suppkey, count(*) AS n, round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS volume
      |FROM lineitem GROUP BY l_suppkey HAVING count(*) > 500
      |ORDER BY l_suppkey""".stripMargin

  /** q19: self-join dependency detection S5 (ref `agents/orbiter.md:55-66`):
    * "later plan depends on earlier plan touching the same resource" —
    * here: pairs of orders by the same customer where one strictly
    * precedes the other; count of predecessors per order ≈ dependency
    * in-degree. Equality conjunct on the key keeps this a hash join. */
  def q19SelfJoinDeps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val a = Tables.orders(s, dir)
      .select($"o_custkey".as("ck"), $"o_orderkey".as("k1"), $"o_orderdate".as("d1"))
    val b = Tables.orders(s, dir)
      .select($"o_custkey".as("ck2"), $"o_orderkey".as("k2"), $"o_orderdate".as("d2"))
    a.join(b, $"ck" === $"ck2" &&
        ($"d2" < $"d1" || ($"d2" === $"d1" && $"k2" < $"k1")))
      .groupBy($"k1")
      .agg(count(lit(1)).as("n_deps"))
      .orderBy($"k1")
  }

  val q19Sql: String =
    """SELECT a.o_orderkey AS k1, count(*) AS n_deps
      |FROM orders a JOIN orders b
      |  ON a.o_custkey = b.o_custkey
      | AND (b.o_orderdate < a.o_orderdate
      |      OR (b.o_orderdate = a.o_orderdate AND b.o_orderkey < a.o_orderkey))
      |GROUP BY a.o_orderkey ORDER BY k1""".stripMargin

  /** q20: range (interval) join — for each signup event, count events by
    * the same user in the following hour (streaming interval-join
    * semantics in batch form, ref watermarked-join row of SURVEY.md §2.2).
    * Hash join on the user key, range as residual filter. */
  def q20RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
    val signups = ev.filter($"event_type" === "signup")
      .select($"event_id".as("signup_id"), $"user_id".as("su"), $"ts".as("su_ts"))
    val later = ev.select($"user_id", $"ts")
    signups.join(later, $"su" === $"user_id" &&
        $"ts" > $"su_ts" &&
        $"ts" <= $"su_ts" + expr("INTERVAL 1 HOUR"))
      .groupBy($"signup_id")
      .agg(count(lit(1)).as("n_follow"))
      .orderBy($"signup_id")
  }

  // events.ts is TIMESTAMP_NS in DuckDB but µs in Spark (Tables.events);
  // cast to µs TIMESTAMP first so boundary comparisons agree.
  val q20Sql: String =
    """WITH ev AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, event_type FROM events)
      |SELECT s.event_id AS signup_id, count(*) AS n_follow
      |FROM ev s JOIN ev e
      |  ON s.user_id = e.user_id
      | AND e.ts > s.ts AND e.ts <= s.ts + INTERVAL 1 HOUR
      |WHERE s.event_type = 'signup'
      |GROUP BY s.event_id ORDER BY signup_id""".stripMargin

  /** q21: as-of join — each event matched to its user's latest order at
    * or before the event time (SURVEY.md §7.3: no Spark built-in),
    * deterministic tiebreak on order key.
    *
    * Replanned through the native [[graft.plans.AsOfJoinExec]] operator
    * (round 6; the join+window formulation with a month-bucket prefilter
    * served rounds 1–5). The operator clusters both sides by user, sorts
    * by (user, time), and does one O(n + m) merge pass holding a single
    * candidate row — no per-event fanout into the user's order history
    * at all, so a heavy user costs its linear scan share and nothing
    * more (skew measurement in PERF.md §as-of). Hash parity vs the
    * unchanged q21Sql window oracle proves the semantics. */
  def q21AsOfJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir).select($"event_id", $"user_id", $"ts")
    val ord = Tables.orders(s, dir)
      .select($"o_orderkey", $"o_custkey",
        // events.ts is TimestampNTZ micros (Tables.events); the operator
        // requires identical time types on both sides
        $"o_orderdate".cast(org.apache.spark.sql.types.TimestampNTZType)
          .as("o_orderdate"))
    graft.plans.AsOf.join(ev, ord,
        leftKeys = Seq("user_id"), rightKeys = Seq("o_custkey"),
        leftTimeCol = "ts", rightTimeCol = "o_orderdate",
        tieBreak = Seq("o_orderkey"))
      .select($"event_id", $"o_orderkey")
      .orderBy($"event_id")
  }

  val q21Sql: String =
    """SELECT event_id, o_orderkey FROM (
      |  SELECT e.event_id, o.o_orderkey,
      |    row_number() OVER (PARTITION BY e.event_id
      |      ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |  FROM events e JOIN orders o
      |    ON e.user_id = o.o_custkey AND o.o_orderdate <= CAST(e.ts AS TIMESTAMP)) t
      |WHERE rn = 1 ORDER BY event_id""".stripMargin

  /** q54: sketch aggregation — HyperLogLog approx_count_distinct next to
    * the exact count. At 100 TB the approx path is the one you actually
    * run: a constant-size sketch mergeable across partitions, no dedup
    * shuffle.
    *
    * Hash-graded since round 6: raw HLL estimates are engine-specific
    * (Spark's and DuckDB's sketches differ), so the graded columns are
    * the exact counts plus a BOUNDED-ACCURACY check — each engine
    * asserts its own estimate lands within 10% of its own exact count
    * (2× the default 5% rsd, deterministic for fixed data). That grades
    * the semantic contract of the sketch ("close to exact") without
    * pinning implementation bits; the raw estimate path stays covered by
    * the unit spec's exact cross-check. */
  def q54ApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // spread the projected scan (r19): the multi-countDistinct Expand
    // multiplies every row 5x before the partial agg, and the scan
    // arrives in 3 splits — the heavy map side ran on 3 of 32 cores
    // (profiled: 1.4 s stage). Project FIRST so the spread shuffles
    // three narrow columns, not the full lineitem row.
    Tables.spread(
      Tables.lineitem(s, dir)
        .select($"l_returnflag", $"l_partkey", $"l_orderkey"),
      "l_orderkey")
      .groupBy($"l_returnflag")
      .agg(
        countDistinct($"l_partkey").as("exact_parts"),
        countDistinct($"l_orderkey").as("exact_orders"),
        (abs(approx_count_distinct($"l_partkey") - countDistinct($"l_partkey")) <=
          countDistinct($"l_partkey") * 0.10).as("approx_ok_parts"),
        (abs(approx_count_distinct($"l_orderkey") - countDistinct($"l_orderkey")) <=
          countDistinct($"l_orderkey") * 0.10).as("approx_ok_orders"))
      .orderBy($"l_returnflag")
  }

  val q54Sql: String =
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS exact_parts,
      |  count(DISTINCT l_orderkey) AS exact_orders,
      |  abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
      |    <= count(DISTINCT l_partkey) * 0.10 AS approx_ok_parts,
      |  abs(approx_count_distinct(l_orderkey) - count(DISTINCT l_orderkey))
      |    <= count(DISTINCT l_orderkey) * 0.10 AS approx_ok_orders
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_approx_distinct" -> (q54ApproxDistinct _),
    "q11_cube"          -> (q11Cube _),
    "q12_string_funcs"  -> (q12StringFuncs _),
    "q13_date_funcs"    -> (q13DateFuncs _),
    "q14_case_priority" -> (q14CasePriority _),
    "q15_top1_group"    -> (q15Top1PerGroup _),
    "q16_correlated"    -> (q16Correlated _),
    "q17_distinct_agg"  -> (q17Distinct _),
    "q18_having"        -> (q18Having _),
    "q19_selfjoin_deps" -> (q19SelfJoinDeps _),
    "q20_range_join"    -> (q20RangeJoin _),
    "q21_asof_join"     -> (q21AsOfJoin _),
  )

  val oracle: Map[String, String] = Map(
    "q11_cube"          -> q11Sql,
    "q12_string_funcs"  -> q12Sql,
    "q13_date_funcs"    -> q13Sql,
    "q14_case_priority" -> q14Sql,
    "q15_top1_group"    -> q15Sql,
    "q16_correlated"    -> q16Sql,
    "q17_distinct_agg"  -> q17Sql,
    "q18_having"        -> q18Sql,
    "q19_selfjoin_deps" -> q19Sql,
    "q20_range_join"    -> q20Sql,
    "q21_asof_join"     -> q21Sql,
    "q54_approx_distinct" -> q54Sql,
  )
}
