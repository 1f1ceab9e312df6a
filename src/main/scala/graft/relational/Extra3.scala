package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Fourth relational wave: value-window functions, string manipulation
  * suite, histogram binning, batch time-bucketing, and deterministic
  * systematic sampling. All DuckDB-oracled. */
object Extra3 {

  /** q81: value windows — first/last/nth order value per customer
    * (frame pinned to the full partition so last_value is well-defined). */
  def q81ValueWindows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_custkey").orderBy($"o_orderdate", $"o_orderkey")
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .select($"o_custkey", $"o_orderkey", $"o_orderdate", $"o_totalprice")
      .withColumn("first_key", first($"o_orderkey").over(full))
      .withColumn("last_key", last($"o_orderkey").over(full))
      .withColumn("second_key", nth_value($"o_orderkey", 2).over(full))
      .filter($"o_custkey" <= 40)
      .select($"o_custkey", $"o_orderkey", $"first_key", $"last_key", $"second_key")
      .orderBy($"o_custkey", $"o_orderkey")
  }

  val q81Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  first_value(o_orderkey) OVER wf AS first_key,
      |  last_value(o_orderkey) OVER wf AS last_key,
      |  nth_value(o_orderkey, 2) OVER wf AS second_key
      |FROM orders
      |WHERE o_custkey <= 40
      |WINDOW wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_custkey, o_orderkey""".stripMargin

  /** q82: string manipulation suite — pad/replace/translate/initcap/
    * repeat/reverse/position. */
  def q82StringSuite(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.nation(s, dir)
      .select($"n_nationkey",
        lpad($"n_name", 12, "_").as("padded"),
        regexp_replace($"n_name", "_", "-").as("dashed"),
        translate($"n_name", "AEIOU", "aeiou").as("lowered_vowels"),
        initcap(lower($"n_name")).as("title"),
        reverse($"n_name").as("rev"),
        instr($"n_name", "_").as("uspos"))
      .orderBy($"n_nationkey")
  }

  val q82Sql: String =
    """SELECT n_nationkey,
      |  lpad(n_name, 12, '_') AS padded,
      |  regexp_replace(n_name, '_', '-', 'g') AS dashed,
      |  translate(n_name, 'AEIOU', 'aeiou') AS lowered_vowels,
      |  array_to_string(list_transform(string_split(lower(n_name), ' '),
      |    w -> upper(substr(w, 1, 1)) || substr(w, 2)), ' ') AS title,
      |  reverse(n_name) AS rev,
      |  CAST(instr(n_name, '_') AS INT) AS uspos
      |FROM nation ORDER BY n_nationkey""".stripMargin

  /** q83: histogram binning — width_bucket over account balances. */
  def q83Histogram(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .withColumn("bucket", width_bucket($"c_acctbal", lit(-1000.0), lit(10000.0), lit(11)))
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"),
        round(min($"c_acctbal"), 2).as("lo"),
        round(max($"c_acctbal"), 2).as("hi"))
      .orderBy($"bucket")
  }

  // DuckDB has no width_bucket; emulate with Spark's exact formula:
  // floor((v - lo) / ((hi - lo) / n)) + 1, clamped to 0 / n+1.
  val q83Sql: String =
    """SELECT CAST(CASE WHEN c_acctbal < -1000.0 THEN 0
      |            WHEN c_acctbal >= 10000.0 THEN 12
      |            ELSE floor((c_acctbal - (-1000.0)) / ((10000.0 - (-1000.0)) / 11)) + 1
      |       END AS BIGINT) AS bucket,
      |  count(*) AS n, round(min(c_acctbal), 2) AS lo, round(max(c_acctbal), 2) AS hi
      |FROM customer GROUP BY 1 ORDER BY bucket""".stripMargin

  /** q84: batch time-bucketing with Spark's `window()` — epoch-aligned
    * 6-hour buckets over events (DuckDB `time_bucket` aligns the same
    * way for epoch-aligned widths). */
  def q84TimeBucket(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy(window($"ts", "6 hours"), $"event_type")
      .agg(count(lit(1)).as("n"))
      .select($"window.start".as("bucket_start"), $"event_type", $"n")
      .orderBy($"bucket_start", $"event_type")
  }

  val q84Sql: String =
    """SELECT time_bucket(INTERVAL 6 HOUR, CAST(ts AS TIMESTAMP)) AS bucket_start,
      |       event_type, count(*) AS n
      |FROM events
      |GROUP BY 1, 2 ORDER BY bucket_start, event_type""".stripMargin

  /** q85: deterministic systematic sampling — key-modulo selection (the
    * reproducible-sampling pattern; engine-portable unlike seeded RNG
    * sampling). */
  def q85Sampling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .filter(pmod($"l_orderkey", lit(97)) < 10)
      .groupBy($"l_returnflag")
      .agg(count(lit(1)).as("n_sampled"),
        round(dsum($"l_extendedprice"), 2).as("sampled_value"))
      .orderBy($"l_returnflag")
  }

  val q85Sql: String =
    """SELECT l_returnflag, count(*) AS n_sampled,
      |  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS sampled_value
      |FROM lineitem WHERE l_orderkey % 97 < 10
      |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q120: unpivot/melt — the inverse of q56's pivot: a wide per-group
    * metrics row melted into (group, metric, value) long form (the shape
    * metric stores and plotting layers consume). Spark's native
    * `Dataset.unpivot` (an Expand node — each input row fans out to
    * one row per value column, no shuffle beyond the source agg);
    * metrics are cast to a common double type first, as unpivot
    * requires. The decimal-backed `dsum` keeps the money sums
    * order-independent before the one rounding. */
  def q120Unpivot(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_orderpriority")
      .agg(
        count(lit(1)).cast("double").as("n_orders"),
        round(dsum($"o_totalprice"), 2).as("total_value"),
        round(dsum($"o_totalprice") / count(lit(1)), 2).as("avg_value"))
      .unpivot(
        Array($"o_orderpriority"),
        Array($"n_orders", $"total_value", $"avg_value"),
        "metric", "value")
      .orderBy($"o_orderpriority", $"metric")
  }

  val q120Sql: String =
    """WITH a AS (
      |  SELECT o_orderpriority,
      |    CAST(count(*) AS DOUBLE) AS n_orders,
      |    round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_value,
      |    round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*), 2) AS avg_value
      |  FROM orders GROUP BY o_orderpriority)
      |SELECT o_orderpriority, metric, value
      |FROM a UNPIVOT (value FOR metric IN (n_orders, total_value, avg_value))
      |ORDER BY o_orderpriority, metric""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q81_value_windows" -> (q81ValueWindows _),
    "q82_string_suite"  -> (q82StringSuite _),
    "q83_histogram"     -> (q83Histogram _),
    "q84_time_bucket"   -> (q84TimeBucket _),
    "q85_sampling"      -> (q85Sampling _),
    "q120_unpivot"      -> (q120Unpivot _),
  )

  val oracle: Map[String, String] = Map(
    "q81_value_windows" -> q81Sql,
    "q82_string_suite"  -> q82Sql,
    "q83_histogram"     -> q83Sql,
    "q84_time_bucket"   -> q84Sql,
    "q85_sampling"      -> q85Sql,
    "q120_unpivot"      -> q120Sql,
  )
}
