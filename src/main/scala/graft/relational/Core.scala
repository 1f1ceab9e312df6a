package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Core relational operator catalog (SURVEY.md §2.2): scans, projection,
  * filter, joins (inner/outer/semi/anti/broadcast), aggregation, windows,
  * sorts/top-k, set ops — each as a named query over the driver test
  * tables with DuckDB-oracle SQL parity.
  *
  * Scale notes (100 TB design):
  *  - dimension joins (`region`/`nation`/`customer`/`part`/`supplier`)
  *    are explicitly `broadcast()` — no shuffle of the fact table;
  *  - fact-fact joins shuffle on the join key only after the narrowest
  *    viable projection + filter, so pushdown reaches the parquet scan;
  *  - all aggregates are hash aggregations with map-side partials
  *    (Catalyst does this automatically for `groupBy.agg`);
  *  - every query ends in a deterministic `orderBy` so the driver's
  *    hash-compare is order-stable (SURVEY.md §7.4). Doubles that are
  *    sums of many terms are rounded to 2 decimals on BOTH sides to
  *    absorb addition-order nondeterminism.
  */
object Core {

  /** q01: TPC-H Q1-style full-scan aggregation (operator S2/S18 analogue:
    * status rollup counts — ref `agents/orbiter.md:198-242`). */
  def q01Agg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        round(dsum($"l_quantity"), 2).as("sum_qty"),
        round(dsum($"l_extendedprice"), 2).as("sum_base_price"),
        round(dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")), 2).as("sum_disc_price"),
        round(dsum($"l_quantity") / count(lit(1)), 2).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      | round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_qty,
      | round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_base_price,
      | round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS sum_disc_price,
      | round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 2) AS avg_qty,
      | count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** q02: top-k revenue join (scheduler top-1 select S8 generalised to
    * top-k — ref `agents/orbiter.md:85-90`): customer ⋈ orders ⋈ lineitem,
    * revenue per order, highest-priority (= revenue) oldest first.
    * `customer` is broadcast; lineitem⋈orders shuffles on the order key. */
  def q02TopkRevenue(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val cust = Tables.customer(s, dir).select($"c_custkey", $"c_mktsegment")
      .filter($"c_mktsegment" === "BUILDING")
    val ord = Tables.orders(s, dir).select($"o_orderkey", $"o_custkey", $"o_orderdate")
    val li = Tables.lineitem(s, dir)
      .select($"l_orderkey", ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate")
      .agg(round(dsum($"rev"), 2).as("revenue"))
      .orderBy($"revenue".desc, $"o_orderdate".asc, $"l_orderkey".asc)
      .limit(10)
  }

  val q02Sql: String =
    """SELECT l_orderkey, o_orderdate, round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
      |LIMIT 10""".stripMargin

  /** q03: broadcast dimension join + aggregation (config lookup S21
    * analogue — ref `scripts/resolve-namespace.sh:17-70`). */
  def q03JoinBrand(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = Tables.part(s, dir).select($"p_partkey", $"p_brand")
    Tables.lineitem(s, dir).select($"l_partkey", $"l_quantity")
      .join(broadcast(p), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n_items"), round(dsum($"l_quantity"), 2).as("total_qty"))
      .orderBy($"p_brand")
  }

  val q03Sql: String =
    """SELECT p_brand, count(*) AS n_items, round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand ORDER BY p_brand""".stripMargin

  /** q04: left-semi join — EXISTS (active-existence predicate S3 — ref
    * `scripts/starry-daemon.sh:65-88`): customers having at least one
    * high-priority order. */
  def q04SemiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val urgent = Tables.orders(s, dir)
      .filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    Tables.customer(s, dir).select($"c_custkey", $"c_name", $"c_mktsegment")
      .join(urgent, $"c_custkey" === $"o_custkey", "left_semi")
      .orderBy($"c_custkey")
  }

  val q04Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** q05: left-anti join — NOT EXISTS (dependency-satisfaction filter S6 —
    * ref `agents/orbiter.md:62-66`): customers with no open ('O') order. */
  def q05AntiJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val open = Tables.orders(s, dir)
      .filter($"o_orderstatus" === "O").select($"o_custkey")
    Tables.customer(s, dir).select($"c_custkey", $"c_name")
      .join(open, $"c_custkey" === $"o_custkey", "left_anti")
      .orderBy($"c_custkey")
  }

  val q05Sql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
      |ORDER BY c_custkey""".stripMargin

  /** q06: left outer join with null handling (nullable-FK semantics —
    * ref marker `pid: null`, `commands/pulsar.md:192-201`): every
    * customer with order count, zero for the order-less. */
  def q06OuterJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ord = Tables.orders(s, dir).select($"o_custkey", $"o_orderkey")
    Tables.customer(s, dir).select($"c_custkey", $"c_mktsegment")
      .join(ord, $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey", $"c_mktsegment")
      .agg(count($"o_orderkey").as("n_orders"))
      .orderBy($"c_custkey")
  }

  val q06Sql: String =
    """SELECT c_custkey, c_mktsegment, count(o_orderkey) AS n_orders
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey, c_mktsegment
      |ORDER BY c_custkey""".stripMargin

  /** q07: window ranking — per-group top-k (scheduler sort+take S8 per
    * partition — ref `agents/orbiter.md:85-90`): 3 highest-value orders
    * per customer. Single shuffle on o_custkey serves both the window
    * and the final order. */
  def q07WindowRank(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey")
      .orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    Tables.orders(s, dir)
      .select($"o_custkey", $"o_orderkey", $"o_totalprice")
      .withColumn("rk", row_number().over(w))
      .filter($"rk" <= 3)
      .orderBy($"o_custkey", $"rk")
  }

  val q07Sql: String =
    """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_custkey
      |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      |  FROM orders) t
      |WHERE rk <= 3
      |ORDER BY o_custkey, rk""".stripMargin

  /** q08: running window aggregate + lag (ETA estimation S19 needs
    * per-key ordered history — ref `commands/pulsar-status.md:87`). */
  def q08WindowRunning(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    Tables.orders(s, dir)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
      .withColumn("running_spend",
        round(sum($"o_totalprice").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2))
      .withColumn("prev_order", lag($"o_orderkey", 1).over(w))
      .filter($"o_custkey" <= 50)
      .select($"o_custkey", $"o_orderkey", $"running_spend", $"prev_order")
      .orderBy($"o_custkey", $"o_orderkey")
  }

  val q08Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate, o_orderkey
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
      |  lag(o_orderkey, 1) OVER (PARTITION BY o_custkey
      |        ORDER BY o_orderdate, o_orderkey) AS prev_order
      |FROM orders
      |WHERE o_custkey <= 50
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q09: set operations — union / intersect / except (queue union across
    * projects S1 + "eligible minus blocked" S6 — ref
    * `scripts/starry-daemon.sh:90-103`, `agents/orbiter.md:62-66`). */
  def q09SetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, dir)
    val building  = c.filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    val rich      = c.filter($"c_acctbal" > 5000).select($"c_custkey")
    val both      = building.intersect(rich).withColumn("tag", lit("both"))
    val onlyRich  = rich.except(building).withColumn("tag", lit("rich_only"))
    both.unionByName(onlyRich)
      .orderBy($"tag", $"c_custkey")
  }

  val q09Sql: String =
    """SELECT * FROM (
      |  SELECT c_custkey, 'both' AS tag FROM (
      |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |    INTERSECT
      |    SELECT c_custkey FROM customer WHERE c_acctbal > 5000)
      |  UNION ALL
      |  SELECT c_custkey, 'rich_only' AS tag FROM (
      |    SELECT c_custkey FROM customer WHERE c_acctbal > 5000
      |    EXCEPT
      |    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'))
      |ORDER BY tag, c_custkey""".stripMargin

  /** q10: rollup — hierarchical subtotals region→nation (status overview
    * rollup S18 — ref `commands/pulse.md:27-61`). Null grouping keys are
    * replaced with a sentinel so Spark and DuckDB sort them identically. */
  def q10Rollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    val c = Tables.customer(s, dir).select($"c_nationkey", $"c_acctbal")
    c.join(broadcast(n), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(r), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_cust"), round(dsum($"c_acctbal"), 2).as("total_bal"))
      .select(coalesce($"r_name", lit("ALL")).as("r_name"),
        coalesce($"n_name", lit("ALL")).as("n_name"),
        $"n_cust", $"total_bal")
      .orderBy($"r_name", $"n_name")
  }

  val q10Sql: String =
    """SELECT coalesce(r_name, 'ALL') AS r_name, coalesce(n_name, 'ALL') AS n_name,
      |       count(*) AS n_cust, round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_bal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name, n_name""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg"            -> (q01Agg _),
    "q02_topk_revenue"   -> (q02TopkRevenue _),
    "q03_join_brand"     -> (q03JoinBrand _),
    "q04_semi_join"      -> (q04SemiJoin _),
    "q05_anti_join"      -> (q05AntiJoin _),
    "q06_outer_join"     -> (q06OuterJoin _),
    "q07_window_rank"    -> (q07WindowRank _),
    "q08_window_running" -> (q08WindowRunning _),
    "q09_set_ops"        -> (q09SetOps _),
    "q10_rollup"         -> (q10Rollup _),
  )

  val oracle: Map[String, String] = Map(
    "q01_agg"            -> q01Sql,
    "q02_topk_revenue"   -> q02Sql,
    "q03_join_brand"     -> q03Sql,
    "q04_semi_join"      -> q04Sql,
    "q05_anti_join"      -> q05Sql,
    "q06_outer_join"     -> q06Sql,
    "q07_window_rank"    -> q07Sql,
    "q08_window_running" -> q08Sql,
    "q09_set_ops"        -> q09Sql,
    "q10_rollup"         -> q10Sql,
  )
}
