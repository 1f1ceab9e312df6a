package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Third relational wave: null semantics, array/map/higher-order
  * functions, lateral explode, rank distributions, explicit grouping
  * sets (through the SQL entry point), and date arithmetic. */
object Extra2 {

  /** q68: null semantics — nullif/coalesce/null-safe predicates. */
  def q68NullHandling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .withColumn("bal_pos",
        when($"c_acctbal" < 0, lit(null).cast("double")).otherwise($"c_acctbal"))
      .select($"c_custkey",
        $"bal_pos".isNull.as("was_negative"),
        coalesce($"bal_pos", lit(-1.0)).as("bal_or_sentinel"),
        coalesce(nullif($"c_mktsegment", lit("BUILDING")), lit("(bldg)")).as("seg2"),
        ($"bal_pos" <=> lit(null).cast("double")).as("nullsafe_isnull"))
      .orderBy($"c_custkey")
  }

  val q68Sql: String =
    """SELECT c_custkey,
      |  bal_pos IS NULL AS was_negative,
      |  coalesce(bal_pos, -1.0) AS bal_or_sentinel,
      |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(bldg)') AS seg2,
      |  bal_pos IS NOT DISTINCT FROM NULL AS nullsafe_isnull
      |FROM (SELECT c_custkey, c_mktsegment,
      |        CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_pos
      |      FROM customer) t
      |ORDER BY c_custkey""".stripMargin

  /** q69: array function suite over embeddings — slice / transform /
    * reverse / element_at / min / max. The sliced-and-reversed arrays
    * are exploded to one scalar row per position (the driver's pandas
    * comparator cannot sort array-typed columns), which still exercises
    * every array op while keeping the output hash-comparable.
    *
    * Value parity: every graded value is a PASS-THROUGH of an input
    * float widened to double (slice / reverse / element_at / min / max do
    * no arithmetic), and float→double widening is exact in IEEE 754 — so
    * both engines hold bit-identical doubles. Any quantization on top
    * (round(x,3) or CAST AS DECIMAL) only *introduces* divergence: Spark
    * rounds the double's shortest decimal string while DuckDB rounds the
    * exact binary value, and they disagree at .0005 boundaries. Grade raw. */
  def q69ArrayFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select($"vec_id",
        transform($"embedding", x => x.cast("double")).as("v"))
      .select($"vec_id",
        size($"v").as("dim"),
        slice($"v", 1, 4).as("f4"),
        reverse(slice($"v", 1, 4)).as("r4"),
        array_max($"v").as("mx"),
        array_min($"v").as("mn"))
      .select($"vec_id", $"dim", $"mx", $"mn", $"r4",
        posexplode($"f4").as(Seq("pos", "fv")))
      .withColumn("rv", element_at($"r4", $"pos" + 1))
      .drop("r4")
      .orderBy($"vec_id", $"pos")
  }

  val q69Sql: String =
    """SELECT vec_id, dim, mx, mn, CAST(pos AS INT) AS pos, fv, r4[pos + 1] AS rv
      |FROM (
      |  SELECT vec_id,
      |    CAST(len(v) AS INT) AS dim,
      |    list_max(v) AS mx,
      |    list_min(v) AS mn,
      |    list_reverse(v[1:4]) AS r4,
      |    generate_subscripts(v[1:4], 1) - 1 AS pos,
      |    unnest(v[1:4]) AS fv
      |  FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) t) u
      |ORDER BY vec_id, pos""".stripMargin

  /** q70: map functions — construction, merge, lookup, filter. The map
    * itself never leaves the query: every output column is a scalar, so
    * the oracle restates the semantics relationally (the map is built
    * from sorted unique names, hence size = count, first key = min,
    * filtered size = conditional count) without needing DuckDB's map
    * type at all. */
  def q70MapFuncs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.nation(s, dir)
      .groupBy($"n_regionkey")
      .agg(map_from_arrays(
        array_sort(collect_list($"n_name")),
        transform(array_sort(collect_list($"n_name")), n => length(n)))
        .as("name_lens"))
      .select($"n_regionkey",
        size($"name_lens").as("n_entries"),
        element_at(map_keys($"name_lens"), 1).as("first_key"),
        size(map_filter($"name_lens", (_, v) => v > 8)).as("n_long_names"))
      .orderBy($"n_regionkey")
  }

  val q70Sql: String =
    """SELECT n_regionkey,
      |  CAST(count(*) AS INT) AS n_entries,
      |  min(n_name) AS first_key,
      |  CAST(sum(CASE WHEN length(n_name) > 8 THEN 1 ELSE 0 END) AS INT) AS n_long_names
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  /** q71: higher-order functions — exists / forall / filter / aggregate. */
  def q71HigherOrder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .select($"vec_id",
        exists($"v", _ > 0.0).as("any_pos"),
        forall($"v", _ < 1.0).as("all_lt1"),
        size(filter($"v", _ > 0.0)).as("n_pos"),
        round(aggregate($"v", lit(0.0), (a, x) => a + x), 4).as("vsum"))
      .orderBy($"vec_id")
  }

  val q71Sql: String =
    """SELECT vec_id,
      |  len(list_filter(v, x -> x > 0.0)) > 0 AS any_pos,
      |  len(list_filter(v, x -> x >= 1.0)) = 0 AS all_lt1,
      |  CAST(len(list_filter(v, x -> x > 0.0)) AS INT) AS n_pos,
      |  round(list_sum(v), 4) AS vsum
      |FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings) t
      |ORDER BY vec_id""".stripMargin

  /** q72: lateral explode with position (generator/UDTF shape). Graded
    * RAW per q69's pass-through rule: x is a float widened to double
    * (exact), so both engines hold identical bits — a round() on top
    * would only INTRODUCE divergence (Spark rounds the shortest decimal
    * string, DuckDB the exact binary value; they disagree at .00005
    * boundaries). */
  def q72Lateral(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .filter($"vec_id" < 5)
      .select($"vec_id", posexplode(transform($"embedding", x => x.cast("double")))
        .as(Seq("pos", "x")))
      .orderBy($"vec_id", $"pos")
  }

  val q72Sql: String =
    """SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
      |       unnest(CAST(embedding AS DOUBLE[])) AS x
      |FROM embeddings WHERE vec_id < 5
      |ORDER BY vec_id, pos""".stripMargin

  /** q73: rank-distribution suite — percent_rank, cume_dist, ntile
    * (ntile tie order pinned by key so both engines tile identically). */
  def q73RankSuite(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice", $"o_orderkey")
    Tables.orders(s, dir)
      .select($"o_orderpriority", $"o_orderkey", $"o_totalprice")
      .withColumn("pr", round(percent_rank().over(w), 6))
      .withColumn("cd", round(cume_dist().over(w), 6))
      .withColumn("quartile", ntile(4).over(w))
      .filter($"o_orderkey" <= 500)
      .select($"o_orderpriority", $"o_orderkey", $"pr", $"cd", $"quartile")
      .orderBy($"o_orderpriority", $"o_orderkey")
  }

  val q73Sql: String =
    """SELECT o_orderpriority, o_orderkey, pr, cd, quartile FROM (
      |  SELECT o_orderpriority, o_orderkey,
      |    round(percent_rank() OVER w, 6) AS pr,
      |    round(cume_dist() OVER w, 6) AS cd,
      |    ntile(4) OVER w AS quartile
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)) t
      |WHERE o_orderkey <= 500
      |ORDER BY o_orderpriority, o_orderkey""".stripMargin

  /** q74: explicit GROUPING SETS through the SQL entry point
    * (`spark.sql` over registered views — the engine's second front
    * door next to the DataFrame API). */
  def q74GroupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    s.sql(
      """SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
        |       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
        |       count(*) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus, o_orderpriority""".stripMargin)
  }

  val q74Sql: String =
    """SELECT coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
      |       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
      |       count(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  /** q75: date arithmetic — interval add, month add, last_day, ISO
    * weekday, day difference from a fixed epoch. */
  def q75DateArith(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .filter($"o_orderkey" <= 300)
      .select($"o_orderkey",
        ($"o_orderdate" + expr("INTERVAL 7 DAYS")).as("plus_week"),
        add_months($"o_orderdate", 1).cast("timestamp_ntz").as("plus_month"),
        last_day($"o_orderdate").cast("timestamp_ntz").as("month_end"),
        (weekday($"o_orderdate") + 1).as("isodow"),
        datediff($"o_orderdate", lit("1995-01-01").cast("timestamp_ntz")).as("days_since"))
      .orderBy($"o_orderkey")
  }

  val q75Sql: String =
    """SELECT o_orderkey,
      |  o_orderdate + INTERVAL 7 DAY AS plus_week,
      |  CAST(o_orderdate + INTERVAL 1 MONTH AS TIMESTAMP) AS plus_month,
      |  CAST(last_day(o_orderdate) AS TIMESTAMP) AS month_end,
      |  CAST(isodow(o_orderdate) AS INT) AS isodow,
      |  CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INT) AS days_since
      |FROM orders WHERE o_orderkey <= 300
      |ORDER BY o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q68_null_handling" -> (q68NullHandling _),
    "q69_array_funcs"   -> (q69ArrayFuncs _),
    "q70_map_funcs"     -> (q70MapFuncs _),
    "q71_higher_order"  -> (q71HigherOrder _),
    "q72_lateral"       -> (q72Lateral _),
    "q73_rank_suite"    -> (q73RankSuite _),
    "q74_grouping_sets" -> (q74GroupingSets _),
    "q75_date_arith"    -> (q75DateArith _),
  )

  val oracle: Map[String, String] = Map(
    "q68_null_handling" -> q68Sql,
    "q69_array_funcs"   -> q69Sql,
    "q70_map_funcs"     -> q70Sql,
    "q71_higher_order"  -> q71Sql,
    "q72_lateral"       -> q72Sql,
    "q73_rank_suite"    -> q73Sql,
    "q74_grouping_sets" -> q74Sql,
    "q75_date_arith"    -> q75Sql,
  )
}
