package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Second relational breadth wave: pivot, exact percentiles, ordered
  * string aggregation, ranged window frames, math scalar suite,
  * IN-subquery, conditional aggregation, edit distance, union-all vs
  * union, cross join. All DuckDB-oracled. */
object Extra {

  /** q56: pivot — status × segment matrix as conditional aggregation
    * (identical form on both sides so empty cells are 0, not null). */
  def q56Pivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir).select($"o_custkey", $"o_orderstatus")
    val c = Tables.customer(s, dir).select($"c_custkey", $"c_mktsegment")
    o.join(broadcast(c), $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment")
      .agg(
        count(when($"o_orderstatus" === "O", 1)).as("n_open"),
        count(when($"o_orderstatus" === "F", 1)).as("n_filled"),
        count(when($"o_orderstatus" === "P", 1)).as("n_pending"))
      .orderBy($"c_mktsegment")
  }

  val q56Sql: String =
    """SELECT c_mktsegment,
      |  count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_open,
      |  count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_filled,
      |  count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_pending
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q57: exact percentiles — median and p90 of order value per
    * priority (Spark `percentile` ≙ DuckDB `quantile_cont`, both
    * linear-interpolating on sorted doubles). */
  def q57Percentiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_orderpriority")
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 2).as("median_price"),
        round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90_price"),
        count(lit(1)).as("n"))
      .orderBy($"o_orderpriority")
  }

  val q57Sql: String =
    """SELECT o_orderpriority,
      |  round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
      |  round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** q58: ordered string aggregation — nations per region as a sorted
    * CSV (order pinned on both sides for hash parity). */
  def q58StringAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.nation(s, dir).join(broadcast(Tables.region(s, dir)),
        $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(concat_ws(",", array_sort(collect_list($"n_name"))).as("nations"),
        count(lit(1)).as("n_nations"))
      .orderBy($"r_name")
  }

  val q58Sql: String =
    """SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations,
      |       count(*) AS n_nations
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** q59: window frames — 30-day trailing average spend (RANGE frame on
    * epoch micros), dense_rank and lead over per-customer history. */
  def q59WindowFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val DayUs = 86400000000L
    val o = Tables.orders(s, dir)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
      .withColumn("ts_us", unix_micros($"o_orderdate".cast("timestamp")))
    val wRange = Window.partitionBy($"o_custkey").orderBy($"ts_us")
      .rangeBetween(-30 * DayUs, 0)
    val wSeq = Window.partitionBy($"o_custkey").orderBy($"ts_us", $"o_orderkey")
    // decimal sum keeps the frame average independent of accumulation
    // order (double addition is not associative; one row at sf0.01 hit
    // a .005 rounding boundary)
    o.withColumn("avg_30d",
        round(sum($"o_totalprice".cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .over(wRange).cast("double") / count(lit(1)).over(wRange), 2))
      .withColumn("rk", dense_rank().over(wSeq))
      .withColumn("next_order", lead($"o_orderkey", 1).over(wSeq))
      .filter($"o_custkey" <= 30)
      .select($"o_custkey", $"o_orderkey", $"avg_30d", $"rk", $"next_order")
      .orderBy($"o_custkey", $"rk", $"o_orderkey")
  }

  val q59Sql: String =
    """WITH o AS (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |         epoch_us(o_orderdate) AS ts_us
      |  FROM orders)
      |SELECT o_custkey, o_orderkey,
      |  round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (PARTITION BY o_custkey ORDER BY ts_us
      |        RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |        / count(*) OVER (PARTITION BY o_custkey ORDER BY ts_us
      |        RANGE BETWEEN 2592000000000 PRECEDING AND CURRENT ROW), 2) AS avg_30d,
      |  dense_rank() OVER w AS rk,
      |  lead(o_orderkey, 1) OVER w AS next_order
      |FROM o
      |WHERE o_custkey <= 30
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY ts_us, o_orderkey)
      |ORDER BY o_custkey, rk, o_orderkey""".stripMargin

  /** q60: math scalar suite over part prices. */
  def q60MathFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.part(s, dir)
      .select($"p_partkey",
        round(sqrt($"p_retailprice"), 6).as("sq"),
        round(pow($"p_size", 2), 6).as("sz2"),
        round(log($"p_retailprice"), 6).as("ln_price"),
        abs($"p_size" - 25).as("dev"),
        ceil($"p_retailprice").as("cl"),
        floor($"p_retailprice").as("fl"),
        pmod($"p_partkey", lit(7)).as("m7"),
        signum($"p_size" - 25).cast("int").as("sgn"))
      .orderBy($"p_partkey")
  }

  val q60Sql: String =
    """SELECT p_partkey,
      |  round(sqrt(p_retailprice), 6) AS sq,
      |  round(pow(p_size, 2), 6) AS sz2,
      |  round(ln(p_retailprice), 6) AS ln_price,
      |  CAST(abs(p_size - 25) AS INT) AS dev,
      |  CAST(ceil(p_retailprice) AS BIGINT) AS cl,
      |  CAST(floor(p_retailprice) AS BIGINT) AS fl,
      |  p_partkey % 7 AS m7,
      |  CAST(CASE WHEN p_size - 25 > 0 THEN 1 WHEN p_size - 25 < 0 THEN -1 ELSE 0 END AS INT) AS sgn
      |FROM part ORDER BY p_partkey""".stripMargin

  /** q61: IN-subquery membership predicate. */
  def q61InSubquery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val building = Tables.customer(s, dir)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey")
    Tables.orders(s, dir)
      .join(building.hint("broadcast"), $"o_custkey" === $"c_custkey", "left_semi")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n"), round(dsum($"o_totalprice"), 2).as("total"))
      .orderBy($"o_orderstatus")
  }

  val q61Sql: String =
    """SELECT o_orderstatus, count(*) AS n, round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS total
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** q62: conditional aggregation — count_if / FILTER semantics. */
  def q62ConditionalAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        count_if($"l_discount" > 0.05).as("n_discounted"),
        count_if($"l_tax" === 0.0).as("n_taxfree"),
        round(dsum(when($"l_discount" > 0.05, $"l_extendedprice").otherwise(0.0)), 2)
          .as("discounted_value"))
      .orderBy($"l_returnflag")
  }

  val q62Sql: String =
    """SELECT l_returnflag,
      |  count(*) FILTER (WHERE l_discount > 0.05) AS n_discounted,
      |  count(*) FILTER (WHERE l_tax = 0.0) AS n_taxfree,
      |  round(CAST(sum(CAST(CASE WHEN l_discount > 0.05 THEN l_extendedprice ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE), 2) AS discounted_value
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q63: edit distance — near-matching name pairs (fuzzy FK repair, the
    * S21 rename-detection generalized). */
  def q63Levenshtein(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n1 = Tables.nation(s, dir).select($"n_nationkey".as("k1"), $"n_name".as("name1"))
    val n2 = Tables.nation(s, dir).select($"n_nationkey".as("k2"), $"n_name".as("name2"))
    n1.crossJoin(n2).filter($"k1" < $"k2")
      .withColumn("dist", levenshtein($"name1", $"name2"))
      .filter($"dist" <= 2)
      .select($"name1", $"name2", $"dist")
      .orderBy($"name1", $"name2")
  }

  val q63Sql: String =
    """SELECT a.n_name AS name1, b.n_name AS name2,
      |       CAST(levenshtein(a.n_name, b.n_name) AS INT) AS dist
      |FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
      |WHERE levenshtein(a.n_name, b.n_name) <= 2
      |ORDER BY name1, name2""".stripMargin

  /** q64: UNION ALL vs UNION (distinct) cardinalities. */
  def q64UnionSemantics(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val a = Tables.orders(s, dir).filter($"o_orderstatus" === "O").select($"o_custkey")
    val b = Tables.orders(s, dir).filter($"o_totalprice" > 100000.0).select($"o_custkey")
    val all = a.unionAll(b).count()
    val dedup = a.union(b).distinct().count()
    Seq(("union_all", all), ("union_distinct", dedup)).toDF("variant", "n")
      .orderBy($"variant")
  }

  val q64Sql: String =
    """SELECT variant, n FROM (
      |  SELECT 'union_all' AS variant, count(*) AS n FROM (
      |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |    UNION ALL
      |    SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0)
      |  UNION ALL
      |  SELECT 'union_distinct', count(*) FROM (
      |    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |    UNION
      |    SELECT o_custkey FROM orders WHERE o_totalprice > 100000.0))
      |ORDER BY variant""".stripMargin

  /** q65: explicit cross join — region × order-status grid with counts
    * grafted on (small-dimensional cartesian, the only safe kind). */
  def q65CrossJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val statuses = Tables.orders(s, dir).select($"o_orderstatus").distinct()
    val counts = Tables.orders(s, dir).groupBy($"o_orderstatus".as("st"))
      .agg(count(lit(1)).as("n_orders"))
    Tables.region(s, dir).select($"r_name")
      .crossJoin(statuses)
      .join(counts, $"o_orderstatus" === $"st")
      .select($"r_name", $"o_orderstatus", $"n_orders")
      .orderBy($"r_name", $"o_orderstatus")
  }

  val q65Sql: String =
    """SELECT r_name, o_orderstatus, n_orders
      |FROM region
      |CROSS JOIN (SELECT o_orderstatus, count(*) AS n_orders
      |            FROM orders GROUP BY o_orderstatus) s
      |ORDER BY r_name, o_orderstatus""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q56_pivot"           -> (q56Pivot _),
    "q57_percentiles"     -> (q57Percentiles _),
    "q58_string_agg"      -> (q58StringAgg _),
    "q59_window_frames"   -> (q59WindowFrames _),
    "q60_math_funcs"      -> (q60MathFuncs _),
    "q61_in_subquery"     -> (q61InSubquery _),
    "q62_conditional_agg" -> (q62ConditionalAgg _),
    "q63_levenshtein"     -> (q63Levenshtein _),
    "q64_union_semantics" -> (q64UnionSemantics _),
    "q65_cross_join"      -> (q65CrossJoin _),
  )

  val oracle: Map[String, String] = Map(
    "q56_pivot"           -> q56Sql,
    "q57_percentiles"     -> q57Sql,
    "q58_string_agg"      -> q58Sql,
    "q59_window_frames"   -> q59Sql,
    "q60_math_funcs"      -> q60Sql,
    "q61_in_subquery"     -> q61Sql,
    "q62_conditional_agg" -> q62Sql,
    "q63_levenshtein"     -> q63Sql,
    "q64_union_semantics" -> q64Sql,
    "q65_cross_join"      -> q65Sql,
  )
}
