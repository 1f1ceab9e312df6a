package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Deep multi-join analytics (TPC-H Q5/Q9 shapes) plus the skew-salting
  * pattern, scalar subqueries, and bag-semantics set ops.
  *
  * Scale notes: the star joins broadcast every dimension chain
  * (region→nation, part, supplier) so the only shuffles are fact-fact
  * (lineitem⋈orders) and the final aggregation. q78 shows two-stage
  * salted aggregation — the standard counter to hot grouping keys: a
  * salted partial shrinks each reducer's input to |salts| rows per hot
  * key before the tiny final stage. */
object Analytics {

  /** q76: TPC-H Q5 shape — revenue by nation where customer and supplier
    * share the nation, restricted to one region. Six-table join. */
  def q76LocalVolume(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val region = Tables.region(s, dir).filter($"r_name" === "AFRICA")
    val nation = Tables.nation(s, dir)
      .join(broadcast(region), $"n_regionkey" === $"r_regionkey")
      .select($"n_nationkey", $"n_name")
    val cust = Tables.customer(s, dir).select($"c_custkey", $"c_nationkey")
    val supp = Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")
    val ord = Tables.orders(s, dir).select($"o_orderkey", $"o_custkey")
    val li = Tables.lineitem(s, dir)
      .select($"l_orderkey", $"l_suppkey",
        ($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .filter($"c_nationkey" === $"s_nationkey")
      .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(round(dsum($"rev"), 2).as("revenue"), count(lit(1)).as("n_items"))
      .orderBy($"revenue".desc, $"n_name")
  }

  val q76Sql: String =
    """SELECT n_name,
      |  round(CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation   ON s_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |WHERE c_nationkey = s_nationkey AND r_name = 'AFRICA'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** q77: TPC-H Q9 shape — profit by supplier nation and order year for
    * a part-name family. */
  def q77ProfitByNation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val part = Tables.part(s, dir).filter($"p_name".contains("widget"))
      .select($"p_partkey", $"p_retailprice")
    val supp = Tables.supplier(s, dir).select($"s_suppkey", $"s_nationkey")
    val nation = Tables.nation(s, dir).select($"n_nationkey", $"n_name")
    val ord = Tables.orders(s, dir).select($"o_orderkey", year($"o_orderdate").as("o_year"))
    val li = Tables.lineitem(s, dir).select($"l_orderkey", $"l_partkey", $"l_suppkey",
      ($"l_extendedprice" * (lit(1.0) - $"l_discount") - $"l_quantity" * $"l_tax").as("amount"))
    li.join(broadcast(part), $"l_partkey" === $"p_partkey")
      .join(broadcast(supp), $"l_suppkey" === $"s_suppkey")
      .join(broadcast(nation), $"s_nationkey" === $"n_nationkey")
      .join(ord, $"l_orderkey" === $"o_orderkey")
      .groupBy($"n_name", $"o_year")
      .agg(round(dsum($"amount"), 2).as("profit"))
      .orderBy($"n_name", $"o_year".desc)
  }

  val q77Sql: String =
    """SELECT n_name, CAST(o_year AS INT) AS o_year,
      |       round(CAST(sum(CAST(amount AS DECIMAL(18,4))) AS DOUBLE), 2) AS profit
      |FROM (
      |  SELECT n_name, year(o_orderdate) AS o_year,
      |         l_extendedprice * (1.0 - l_discount) - l_quantity * l_tax AS amount
      |  FROM lineitem
      |  JOIN part     ON l_partkey = p_partkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation   ON s_nationkey = n_nationkey
      |  JOIN orders   ON l_orderkey = o_orderkey
      |  WHERE p_name LIKE '%widget%') t
      |GROUP BY n_name, o_year
      |ORDER BY n_name, o_year DESC""".stripMargin

  /** q78: two-stage salted aggregation — the skew-mitigation pattern for
    * hot grouping keys (3 return flags over the whole fact table):
    * stage 1 aggregates by (key, salt) so the hot key fans out across
    * reducers; stage 2 merges |salts| partials per key. Result is
    * identical to the direct groupBy (oracle = plain SQL aggregate). */
  def q78SaltedAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val Salts = 16
    Tables.lineitem(s, dir)
      .select($"l_returnflag", $"l_quantity", $"l_orderkey")
      .withColumn("salt", pmod(hash($"l_orderkey"), lit(Salts)))
      .groupBy($"l_returnflag", $"salt")
      .agg(sum($"l_quantity".cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("pq"),
        count(lit(1)).as("pn"))
      .groupBy($"l_returnflag")
      .agg(round(sum($"pq").cast("double"), 2).as("total_qty"),
        sum($"pn").as("n"))
      .orderBy($"l_returnflag")
  }

  val q78Sql: String =
    """SELECT l_returnflag,
      |  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_qty,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q79: scalar subquery — orders above the global average price. */
  def q79ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir)
    // The average gates ROW MEMBERSHIP, so it must be bit-identical on
    // both engines: a plain double avg() accumulates in partition order
    // (Spark) vs sequentially (DuckDB) and a price within a few ulps of
    // the mean would flip sides. Decimal sum → double, then divide —
    // order-independent, same bits everywhere (the dsum rule).
    val globalAvg = o.agg(
      (dsum($"o_totalprice") / count(lit(1))).as("ga"))
    o.crossJoin(broadcast(globalAvg))
      .filter($"o_totalprice" > $"ga")
      .groupBy($"o_orderstatus")
      .agg(count(lit(1)).as("n_above"))
      .orderBy($"o_orderstatus")
  }

  val q79Sql: String =
    """SELECT o_orderstatus, count(*) AS n_above
      |FROM orders
      |WHERE o_totalprice > (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
      |                             / count(*) FROM orders)
      |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** q80: bag-semantics set ops — EXCEPT ALL / INTERSECT ALL preserve
    * multiplicity (vs the distinct set ops of q09). */
  def q80BagSetOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val a = Tables.orders(s, dir).filter($"o_orderstatus" =!= "P").select($"o_custkey")
    val b = Tables.orders(s, dir).filter($"o_orderpriority" === "1-URGENT").select($"o_custkey")
    val exceptAll = a.exceptAll(b).groupBy($"o_custkey").agg(count(lit(1)).as("m"))
      .withColumn("op", lit("except_all"))
    val intersectAll = a.intersectAll(b).groupBy($"o_custkey").agg(count(lit(1)).as("m"))
      .withColumn("op", lit("intersect_all"))
    exceptAll.unionByName(intersectAll)
      .select($"op", $"o_custkey", $"m")
      .orderBy($"op", $"o_custkey")
  }

  val q80Sql: String =
    """WITH a AS (SELECT o_custkey FROM orders WHERE o_orderstatus <> 'P'),
      |b AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |SELECT op, o_custkey, m FROM (
      |  SELECT 'except_all' AS op, o_custkey, count(*) AS m FROM (
      |    SELECT o_custkey FROM a EXCEPT ALL SELECT o_custkey FROM b)
      |  GROUP BY o_custkey
      |  UNION ALL
      |  SELECT 'intersect_all', o_custkey, count(*) FROM (
      |    SELECT o_custkey FROM a INTERSECT ALL SELECT o_custkey FROM b)
      |  GROUP BY o_custkey)
      |ORDER BY op, o_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q76_local_volume"    -> (q76LocalVolume _),
    "q77_profit_nation"   -> (q77ProfitByNation _),
    "q78_salted_agg"      -> (q78SaltedAgg _),
    "q79_scalar_subquery" -> (q79ScalarSubquery _),
    "q80_bag_set_ops"     -> (q80BagSetOps _),
  )

  val oracle: Map[String, String] = Map(
    "q76_local_volume"    -> q76Sql,
    "q77_profit_nation"   -> q77Sql,
    "q78_salted_agg"      -> q78Sql,
    "q79_scalar_subquery" -> q79Sql,
    "q80_bag_set_ops"     -> q80Sql,
  )
}
