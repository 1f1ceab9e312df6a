package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Statistical and selector aggregates wave: stddev/variance/corr,
  * arg-max/min selectors, boolean aggregates, grouped EXISTS,
  * multi-column IN, and corpus word frequencies. */
object Stats {

  /** q88: grouped EXISTS — customers having an order with more than 4
    * line items (EXISTS over an aggregated subquery). */
  def q88GroupedExists(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val big = Tables.lineitem(s, dir)
      .groupBy($"l_orderkey").agg(count(lit(1)).as("n"))
      .filter($"n" > 4).select($"l_orderkey")
    val ord = Tables.orders(s, dir).select($"o_orderkey", $"o_custkey")
      .join(big, $"o_orderkey" === $"l_orderkey", "left_semi")
    Tables.customer(s, dir).select($"c_custkey", $"c_mktsegment")
      .join(ord.select($"o_custkey").distinct(), $"c_custkey" === $"o_custkey", "left_semi")
      .groupBy($"c_mktsegment").agg(count(lit(1)).as("n_cust"))
      .orderBy($"c_mktsegment")
  }

  val q88Sql: String =
    """SELECT c_mktsegment, count(*) AS n_cust
      |FROM customer
      |WHERE EXISTS (
      |  SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey
      |    AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
      |                GROUP BY l_orderkey HAVING count(*) > 4))
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q90: multi-column IN — line items whose (orderkey, suppkey) pair
    * appears among urgent orders' pairs. Expressed as a two-column
    * semi-join on both sides. */
  def q90MultiColIn(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val urgentPairs = Tables.lineitem(s, dir)
      .join(Tables.orders(s, dir).filter($"o_orderpriority" === "1-URGENT")
        .select($"o_orderkey"), $"l_orderkey" === $"o_orderkey", "left_semi")
      .select($"l_orderkey".as("uk"), $"l_suppkey".as("us")).distinct()
    Tables.lineitem(s, dir)
      .join(urgentPairs, $"l_orderkey" === $"uk" && $"l_suppkey" === $"us", "left_semi")
      .groupBy($"l_returnflag").agg(count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  // DuckDB lacks tuple-IN subqueries; the correlated EXISTS is the same
  // two-column semi-join.
  val q90Sql: String =
    """SELECT l1.l_returnflag, count(*) AS n
      |FROM lineitem l1
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem l2
      |  JOIN orders ON l2.l_orderkey = o_orderkey
      |  WHERE o_orderpriority = '1-URGENT'
      |    AND l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey = l1.l_suppkey)
      |GROUP BY l1.l_returnflag ORDER BY l1.l_returnflag""".stripMargin

  /** q91: conditional ordering — ORDER BY CASE (urgent first, then by
    * key), the priority-dispatch sort S8 in pure ORDER BY form. */
  def q91CaseOrder(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .filter($"o_orderkey" <= 200)
      .withColumn("lane",
        when($"o_orderpriority" === "1-URGENT", 0)
          .when($"o_orderstatus" === "O", 1).otherwise(2))
      .select($"o_orderkey", $"o_orderpriority", $"lane")
      .orderBy($"lane", $"o_orderkey")
  }

  val q91Sql: String =
    """SELECT o_orderkey, o_orderpriority,
      |  CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN 0
      |       WHEN o_orderstatus = 'O' THEN 1 ELSE 2 END AS INT) AS lane
      |FROM orders WHERE o_orderkey <= 200
      |ORDER BY lane, o_orderkey""".stripMargin

  /** q92: corpus word frequencies — global top-20 tokens (explode +
    * count + top-k, the vocabulary scan of any text pipeline). */
  def q92WordFreq(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(explode(regexp_extract_all(lower($"text"), lit("[a-z]+"), lit(0))).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"w".asc)
      .limit(20)
  }

  val q92Sql: String =
    """SELECT w, count(*) AS n FROM (
      |  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w
      |  FROM documents) t
      |GROUP BY w ORDER BY n DESC, w ASC LIMIT 20""".stripMargin

  /** q93: selector aggregates — the order key holding each priority
    * class's maximum price (max_by ≙ arg_max); price ties broken by the
    * composite (price, key) ordering so both engines select identically. */
  def q93ArgMax(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_orderpriority")
      .agg(
        max_by($"o_orderkey", struct($"o_totalprice", $"o_orderkey")).as("max_key"),
        min_by($"o_orderkey", struct($"o_totalprice", $"o_orderkey")).as("min_key"),
        round(max($"o_totalprice"), 2).as("max_price"))
      .orderBy($"o_orderpriority")
  }

  // DuckDB's arg_max can't take a struct ordering; first_value over the
  // composite sort is the same lexicographic selector.
  val q93Sql: String =
    """SELECT DISTINCT o_orderpriority,
      |  first_value(o_orderkey) OVER (PARTITION BY o_orderpriority
      |    ORDER BY o_totalprice DESC, o_orderkey DESC) AS max_key,
      |  first_value(o_orderkey) OVER (PARTITION BY o_orderpriority
      |    ORDER BY o_totalprice ASC, o_orderkey ASC) AS min_key,
      |  round(max(o_totalprice) OVER (PARTITION BY o_orderpriority), 2) AS max_price
      |FROM orders ORDER BY o_orderpriority""".stripMargin

  /** q94: boolean aggregates — every/any per segment. */
  def q94BoolAgg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.customer(s, dir)
      .groupBy($"c_mktsegment")
      .agg(
        bool_and($"c_acctbal" > -1000.0).as("all_above_floor"),
        bool_or($"c_acctbal" > 9000.0).as("any_rich"),
        count(lit(1)).as("n"))
      .orderBy($"c_mktsegment")
  }

  val q94Sql: String =
    """SELECT c_mktsegment,
      |  bool_and(c_acctbal > -1000.0) AS all_above_floor,
      |  bool_or(c_acctbal > 9000.0) AS any_rich,
      |  count(*) AS n
      |FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** q95: dispersion statistics — stddev/variance (sample), rounded to
    * absorb one-pass accumulation-order noise. */
  def q95Dispersion(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .groupBy($"o_orderstatus")
      .agg(
        round(stddev_samp($"o_totalprice"), 2).as("sd"),
        round(var_samp($"o_totalprice"), 1).as("variance"),
        count(lit(1)).as("n"))
      .orderBy($"o_orderstatus")
  }

  val q95Sql: String =
    """SELECT o_orderstatus,
      |  round(stddev_samp(o_totalprice), 2) AS sd,
      |  round(var_samp(o_totalprice), 1) AS variance,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  /** q96: bivariate statistics — correlation and covariance between
    * quantity and discounted price. */
  def q96Correlation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        round(corr($"l_quantity", $"l_extendedprice"), 4).as("r"),
        round(covar_samp($"l_quantity", $"l_discount"), 6).as("cv"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  val q96Sql: String =
    """SELECT l_returnflag,
      |  round(corr(l_quantity, l_extendedprice), 4) AS r,
      |  round(covar_samp(l_quantity, l_discount), 6) AS cv,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q97: error-safe arithmetic — try_divide/try_cast yield null instead
    * of raising under ANSI mode (DuckDB mirrors with NULLIF/TRY_CAST). */
  def q97TryOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .withColumn("unit_price", try_divide($"l_extendedprice", $"l_quantity" - $"l_quantity"))
      .withColumn("flag_num", expr("try_cast(l_returnflag AS DECIMAL(1,0))"))
      .groupBy($"l_returnflag")
      .agg(
        sum(when($"unit_price".isNull, 1).otherwise(0)).as("n_div_null"),
        sum(when($"flag_num".isNull, 1).otherwise(0)).as("n_cast_null"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  val q97Sql: String =
    """SELECT l_returnflag,
      |  CAST(sum(CASE WHEN l_extendedprice / nullif(l_quantity - l_quantity, 0.0) IS NULL
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_div_null,
      |  CAST(sum(CASE WHEN TRY_CAST(l_returnflag AS DECIMAL(1,0)) IS NULL
      |           THEN 1 ELSE 0 END) AS BIGINT) AS n_cast_null,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q98: bitwise operations — and/or/xor/shift over keys (the bucket
    * and signature manipulation primitives used by the LSH/SimHash
    * family, surfaced as a relational query). */
  def q98BitOps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .filter($"o_orderkey" <= 500)
      .select($"o_orderkey",
        ($"o_orderkey".bitwiseAND(255L)).as("lo_byte"),
        ($"o_orderkey".bitwiseOR(15L)).as("or15"),
        ($"o_orderkey".bitwiseXOR($"o_custkey")).as("xor_cust"),
        shiftright($"o_orderkey", 4).as("shr4"),
        shiftleft($"o_orderkey".bitwiseAND(7L), 2).as("shl2"),
        bit_count($"o_orderkey").as("popcnt"))
      .orderBy($"o_orderkey")
  }

  val q98Sql: String =
    """SELECT o_orderkey,
      |  o_orderkey & 255 AS lo_byte,
      |  o_orderkey | 15 AS or15,
      |  xor(o_orderkey, o_custkey) AS xor_cust,
      |  o_orderkey >> 4 AS shr4,
      |  (o_orderkey & 7) << 2 AS shl2,
      |  CAST(bit_count(o_orderkey) AS INT) AS popcnt
      |FROM orders WHERE o_orderkey <= 500
      |ORDER BY o_orderkey""".stripMargin

  /** q99: chained CTEs through the SQL front door — the multi-stage
    * funnel (filter → aggregate → join → rank) as one SQL statement. */
  def q99ChainedCte(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("orders")
    Tables.customer(s, dir).createOrReplaceTempView("customer")
    s.sql(
      """WITH big AS (
        |  SELECT o_custkey, count(*) AS n_orders,
        |         round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS spend
        |  FROM orders GROUP BY o_custkey HAVING count(*) >= 3),
        |ranked AS (
        |  SELECT b.*, c.c_mktsegment,
        |    row_number() OVER (PARTITION BY c.c_mktsegment
        |                       ORDER BY b.spend DESC, b.o_custkey) AS rk
        |  FROM big b JOIN customer c ON b.o_custkey = c.c_custkey)
        |SELECT c_mktsegment, o_custkey, n_orders, spend, rk
        |FROM ranked WHERE rk <= 5
        |ORDER BY c_mktsegment, rk""".stripMargin)
  }

  val q99Sql: String =
    """WITH big AS (
      |  SELECT o_custkey, count(*) AS n_orders,
      |         round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS spend
      |  FROM orders GROUP BY o_custkey HAVING count(*) >= 3),
      |ranked AS (
      |  SELECT b.*, c.c_mktsegment,
      |    row_number() OVER (PARTITION BY c.c_mktsegment
      |                       ORDER BY b.spend DESC, b.o_custkey) AS rk
      |  FROM big b JOIN customer c ON b.o_custkey = c.c_custkey)
      |SELECT c_mktsegment, o_custkey, n_orders, spend, rk
      |FROM ranked WHERE rk <= 5
      |ORDER BY c_mktsegment, rk""".stripMargin

  /** q139: quantile sketch next to the exact quantile — the q54 pattern
    * for order statistics. At 100 TB exact per-group percentiles cost a
    * sort (or a full collect per group); the approx sketch
    * (Greenwald-Khanna in Spark, t-digest in DuckDB) is constant-size
    * and MERGEABLE across partitions — a map-side partial like any sum,
    * no sort, which is the only shape that survives a 1000-executor
    * aggregation. Raw sketch outputs are engine-specific, so the graded
    * columns are the exact quantiles (rounded; both engines define the
    * continuous quantile by the same linear interpolation) plus each
    * engine's own bounded-accuracy boolean: its sketch estimate lands
    * within 5% of the group's value range of its own exact quantile —
    * grading the sketch's semantic contract without pinning its bits. */
  def q139QuantileSketch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.events(s, dir)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.95)"), 4).as("p95"),
        (abs(expr("approx_percentile(value, 0.5, 10000)") -
          expr("percentile(value, 0.5)")) <=
          (max($"value") - min($"value")) * 0.05).as("sketch_ok_p50"),
        (abs(expr("approx_percentile(value, 0.95, 10000)") -
          expr("percentile(value, 0.95)")) <=
          (max($"value") - min($"value")) * 0.05).as("sketch_ok_p95"))
      .orderBy($"event_type")
  }

  val q139Sql: String =
    """SELECT event_type, count(*) AS n,
      |  round(quantile_cont(value, 0.5), 4) AS p50,
      |  round(quantile_cont(value, 0.95), 4) AS p95,
      |  abs(approx_quantile(value, 0.5) - quantile_cont(value, 0.5))
      |    <= (max(value) - min(value)) * 0.05 AS sketch_ok_p50,
      |  abs(approx_quantile(value, 0.95) - quantile_cont(value, 0.95))
      |    <= (max(value) - min(value)) * 0.05 AS sketch_ok_p95
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q151: count-min-sketch heavy hitters — the frequency member of the
    * sketch family (HLL q54 distincts, GK/t-digest q139 quantiles, Bloom
    * q135 membership; count-min completes the set). At 100 TB the exact
    * per-key count behind a "top offenders" report is a full
    * hash-partitioned shuffle; the count-min sketch is a CONSTANT-SIZE
    * (depth × width counters) MERGEABLE partial — each executor folds its
    * partition into a local sketch and the driver merges depth×width
    * integers, never the keys — which is the only shape that gives
    * frequency estimates from one narrow pass with no shuffle at all.
    * Like q54/q139 the raw sketch is engine-specific, so the graded
    * columns are the exact ranked top-20 (hash-compared) plus this
    * engine's own accuracy boolean for the sketch's two-sided contract:
    * est ≥ true (count-min never undercounts) and est ≤ true + ε·N with
    * confidence δ (ε = 1e-4, δ = 0.99, fixed seed ⇒ deterministic here).
    * The only driver-side values are the sketch bytes and the 20 ranked
    * keys — both constant-size by construction, never data-proportional.
    */
  def q151HeavyHitters(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val eps = 0.0001
    val li = Tables.lineitem(s, dir).select($"l_suppkey")
    val sketchBytes = li
      .select(expr(s"count_min_sketch(l_suppkey, ${eps}d, 0.99d, 42)").as("sk"))
      .head.getAs[Array[Byte]](0)
    val cms = org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(sketchBytes))
    val exact = li.groupBy($"l_suppkey").agg(count(lit(1)).as("n")).persist()
    val total = exact.agg(sum($"n")).head.getLong(0)
    val ranked = exact
      .withColumn("rk", row_number().over(
        Window.orderBy($"n".desc, $"l_suppkey"))) // 1 row/key post-agg: tiny
      .filter($"rk" <= 20)
    val keys = ranked.select($"l_suppkey").collect().map(_.getLong(0))
    val estDf = keys.toSeq.map(k => (k, cms.estimateCount(k))).toDF("k", "est")
    val slack = math.ceil(eps * total).toLong
    ranked.join(broadcast(estDf), $"l_suppkey" === $"k")
      .select($"l_suppkey", $"n", $"rk",
        ($"est" >= $"n" && $"est" <= $"n" + slack).as("cms_ok"))
      .orderBy($"rk")
  }

  val q151Sql: String =
    """WITH c AS (SELECT l_suppkey, count(*) AS n FROM lineitem GROUP BY l_suppkey),
      |r AS (SELECT l_suppkey, n,
      |        row_number() OVER (ORDER BY n DESC, l_suppkey) AS rk FROM c)
      |SELECT l_suppkey, n, rk, TRUE AS cms_ok
      |FROM r WHERE rk <= 20 ORDER BY rk""".stripMargin

  /** q158: ANALYZE-style column profile — the statistics pass an engine
    * runs to feed its cost-based optimizer (and a data pipeline runs as
    * its schema-drift sentinel): per column, row count, null count,
    * exact NDV, and min/max rendered to a canonical string. ONE scan
    * computes every stat as parallel aggregates (Spark expands the
    * multi-distinct agg internally — map-side partials per column), and
    * the wide 1-row result melts to one row per column via `stack` (an
    * Expand projection, no extra shuffle). Numerics render through
    * DECIMAL(18,2) so both engines print identical strings (raw
    * double→string formatting is engine-specific); dates/strings render
    * natively. At 100 TB the same plan holds with NDV switched to the
    * HLL sketch (q54's contract) — exact NDV is kept here because it is
    * what the oracle can grade. */
  def q158ColumnStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    // NDV + null counts: melt (column, value) pairs and run ONE
    // hash-partitioned distinct-shaped aggregation keyed by
    // (col_name, value) — every partition pre-aggregates, the shuffle
    // carries |distinct| rows, and no single reducer ever merges a
    // full distinct SET (the multi-countDistinct Expand plan does
    // exactly that in its single final partition: measured 17.9 s vs
    // 1.4 s for this shape at sf0.1). The string rendering here is an
    // internal GROUPING key only (injective per distinct value in
    // both engines), never an output.
    // spread the projected scan (r19): the melt explodes every row 5x
    // before the distinct-shaped agg and the scan arrives in 3 splits —
    // the heavy map side ran on 3 of 32 cores (profiled: 2.1 s stage).
    val melted = Tables.spread(
      li.select($"l_quantity", $"l_extendedprice", $"l_discount",
        $"l_shipdate", $"l_returnflag", $"l_orderkey"), "l_orderkey")
      .select(explode(array(
        struct(lit("l_quantity").as("col_name"), $"l_quantity".cast("string").as("v")),
        struct(lit("l_extendedprice").as("col_name"), $"l_extendedprice".cast("string").as("v")),
        struct(lit("l_discount").as("col_name"), $"l_discount".cast("string").as("v")),
        struct(lit("l_shipdate").as("col_name"), $"l_shipdate".cast("string").as("v")),
        struct(lit("l_returnflag").as("col_name"), $"l_returnflag".as("v")))).as("m"))
      .select($"m.col_name", $"m.v")
    val dist = melted.groupBy($"col_name", $"v").agg(count(lit(1)).as("cnt"))
      .groupBy($"col_name")
      .agg(sum(when($"v".isNull, $"cnt").otherwise(0L)).as("n_nulls"),
        count(when($"v".isNotNull, 1)).as("ndv"),
        sum($"cnt").as("n"))
    // min/max: plain (non-distinct) aggregates in NATIVE type order —
    // rendered canonically AFTER aggregation (numerics via
    // DECIMAL(18,2) so both engines print identical strings).
    def decs(c: org.apache.spark.sql.Column) =
      c.cast("decimal(18,2)").cast("string")
    val mm = li.agg(
      decs(min($"l_quantity")).as("miq"), decs(max($"l_quantity")).as("maq"),
      decs(min($"l_extendedprice")).as("mip"), decs(max($"l_extendedprice")).as("map"),
      decs(min($"l_discount")).as("mid"), decs(max($"l_discount")).as("mad"),
      min($"l_shipdate").cast("string").as("mis"), max($"l_shipdate").cast("string").as("mas"),
      min($"l_returnflag").as("mif"), max($"l_returnflag").as("maf"))
      .selectExpr("""stack(5,
        'l_quantity',      miq, maq,
        'l_extendedprice', mip, map,
        'l_discount',      mid, mad,
        'l_shipdate',      mis, mas,
        'l_returnflag',    mif, maf)
        AS (col_name, min_s, max_s)""")
    dist.join(broadcast(mm), "col_name")
      .select($"col_name", $"n", $"n_nulls", $"ndv", $"min_s", $"max_s")
      .orderBy($"col_name")
  }

  val q158Sql: String =
    """WITH s AS (
      |  SELECT count(*) AS n,
      |    sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS nq,
      |    count(DISTINCT l_quantity) AS dq,
      |    CAST(CAST(min(l_quantity) AS DECIMAL(18,2)) AS VARCHAR) AS miq,
      |    CAST(CAST(max(l_quantity) AS DECIMAL(18,2)) AS VARCHAR) AS maq,
      |    sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS np,
      |    count(DISTINCT l_extendedprice) AS dp,
      |    CAST(CAST(min(l_extendedprice) AS DECIMAL(18,2)) AS VARCHAR) AS mip,
      |    CAST(CAST(max(l_extendedprice) AS DECIMAL(18,2)) AS VARCHAR) AS map,
      |    sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS nd,
      |    count(DISTINCT l_discount) AS dd,
      |    CAST(CAST(min(l_discount) AS DECIMAL(18,2)) AS VARCHAR) AS mid,
      |    CAST(CAST(max(l_discount) AS DECIMAL(18,2)) AS VARCHAR) AS mad,
      |    sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS ns,
      |    count(DISTINCT l_shipdate) AS ds,
      |    CAST(min(l_shipdate) AS VARCHAR) AS mis,
      |    CAST(max(l_shipdate) AS VARCHAR) AS mas,
      |    sum(CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END) AS nf,
      |    count(DISTINCT l_returnflag) AS df,
      |    min(l_returnflag) AS mif, max(l_returnflag) AS maf
      |  FROM lineitem)
      |SELECT col_name, n, CAST(n_nulls AS BIGINT) AS n_nulls,
      |       ndv, min_s, max_s
      |FROM (
      |  SELECT n, 'l_quantity' AS col_name, nq AS n_nulls, dq AS ndv, miq AS min_s, maq AS max_s FROM s
      |  UNION ALL SELECT n, 'l_extendedprice', np, dp, mip, map FROM s
      |  UNION ALL SELECT n, 'l_discount', nd, dd, mid, mad FROM s
      |  UNION ALL SELECT n, 'l_shipdate', ns, ds, mis, mas FROM s
      |  UNION ALL SELECT n, 'l_returnflag', nf, df, mif, maf FROM s) t
      |ORDER BY col_name""".stripMargin

  /** q163: constraint audit — the data-quality gate a pipeline runs on
    * every ingest (the dbt-test / CHECK-constraint surface this engine
    * otherwise lacks): primary-key uniqueness, foreign-key orphan
    * detection in BOTH directions (child→parent orphans, childless
    * parents), and a domain CHECK — each constraint one row with its
    * violation count, so a scheduler can gate on `violations = 0`
    * without parsing anything.
    *
    * Scale shapes are the constraint-checking canon: PK uniqueness is
    * one keyed count (map-side partial), orphan checks are left-anti /
    * left-semi joins on the FK (broadcast when the parent key set fits,
    * shuffle otherwise — Spark picks per stats), and the domain CHECK
    * is a narrow predicate scan. Nothing here holds state beyond one
    * key's counts. */
  def q163ConstraintAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
    val cust = Tables.customer(s, dir)
    val li = Tables.lineitem(s, dir)
    def cnt(name: String, df: DataFrame) = {
      import df.sparkSession.implicits._
      df.agg(count(lit(1)).as("violations"))
        .select(lit(name).as("constraint_name"), $"violations")
    }
    val pkDup = orders.groupBy($"o_orderkey").agg(count(lit(1)).as("c"))
      .filter($"c" > 1)
    val fkOrphanOrders = orders.join(cust,
      orders("o_custkey") === cust("c_custkey"), "left_anti")
    val fkOrphanLines = li.join(orders,
      li("l_orderkey") === orders("o_orderkey"), "left_anti")
    val childlessOrders = orders.join(li,
      orders("o_orderkey") === li("l_orderkey"), "left_anti")
    val domain = li.filter($"l_discount" < 0.0 || $"l_discount" > 1.0 ||
      $"l_quantity" <= 0.0 || $"l_tax" < 0.0 || $"l_shipdate".isNull)
    cnt("pk_orders_unique", pkDup)
      .unionByName(cnt("fk_orders_customer", fkOrphanOrders))
      .unionByName(cnt("fk_lineitem_orders", fkOrphanLines))
      .unionByName(cnt("orders_have_lines", childlessOrders))
      .unionByName(cnt("check_lineitem_domain", domain))
      .orderBy($"constraint_name")
  }

  val q163Sql: String =
    """SELECT * FROM (
      |  SELECT 'pk_orders_unique' AS constraint_name, count(*) AS violations
      |  FROM (SELECT o_orderkey FROM orders GROUP BY o_orderkey HAVING count(*) > 1) t
      |  UNION ALL
      |  SELECT 'fk_orders_customer', count(*)
      |  FROM orders o WHERE NOT EXISTS
      |    (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
      |  UNION ALL
      |  SELECT 'fk_lineitem_orders', count(*)
      |  FROM lineitem l WHERE NOT EXISTS
      |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
      |  UNION ALL
      |  SELECT 'orders_have_lines', count(*)
      |  FROM orders o WHERE NOT EXISTS
      |    (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
      |  UNION ALL
      |  SELECT 'check_lineitem_domain', count(*)
      |  FROM lineitem
      |  WHERE l_discount < 0.0 OR l_discount > 1.0 OR l_quantity <= 0.0
      |     OR l_tax < 0.0 OR l_shipdate IS NULL) u
      |ORDER BY constraint_name""".stripMargin

  /** q171: DISCRETE percentiles — the order-statistic semantics next to
    * q57's interpolating (continuous) form: percentile_disc picks an
    * ACTUAL data value (the first value whose cumulative distribution
    * reaches p), so the output is a copy of an input datum — hash-exact
    * across engines with no rounding discipline needed, and the right
    * choice when the percentile must be a realizable value (a real
    * latency, a real price). Spark's inverse-distribution syntax
    * (`WITHIN GROUP (ORDER BY …)`) against DuckDB's quantile_disc. */
  def q171PercentileDisc(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag")
      .agg(
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY l_quantity)").as("p25"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_quantity)").as("p50"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY l_quantity)").as("p75"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY l_extendedprice)").as("p50_price"),
        count(lit(1)).as("n"))
      .orderBy($"l_returnflag")
  }

  val q171Sql: String =
    """SELECT l_returnflag,
      |  quantile_disc(l_quantity, 0.25) AS p25,
      |  quantile_disc(l_quantity, 0.5) AS p50,
      |  quantile_disc(l_quantity, 0.75) AS p75,
      |  quantile_disc(l_extendedprice, 0.5) AS p50_price,
      |  count(*) AS n
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  /** q172: MODE (most frequent value) per group with a TOTAL tie order
    * — the built-in `mode()` in both engines leaves ties
    * implementation-defined, which is exactly the kind of
    * nondeterminism the hash gate exists to forbid; the operator is
    * therefore stated as what it is relationally: count per (group,
    * value), rank by (count DESC, value ASC), keep rank 1. Same
    * two-aggregation shape the built-in runs internally, fully
    * portable, and the tie rule is in the query text where a reader
    * can see it. */
  def q172ModePerGroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, dir)
      .groupBy($"l_returnflag", $"l_quantity")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rk", row_number().over(
        Window.partitionBy($"l_returnflag")
          .orderBy($"cnt".desc, $"l_quantity".asc)))
      .filter($"rk" === 1)
      .select($"l_returnflag", $"l_quantity".as("mode_qty"), $"cnt".as("mode_n"))
      .orderBy($"l_returnflag")
  }

  val q172Sql: String =
    """SELECT l_returnflag, l_quantity AS mode_qty, cnt AS mode_n
      |FROM (
      |  SELECT l_returnflag, l_quantity, count(*) AS cnt,
      |    row_number() OVER (PARTITION BY l_returnflag
      |                       ORDER BY count(*) DESC, l_quantity ASC) AS rk
      |  FROM lineitem GROUP BY l_returnflag, l_quantity) t
      |WHERE rk = 1 ORDER BY l_returnflag""".stripMargin

  /** q173: COUNT(DISTINCT) OVER a window — a genuine Spark limitation
    * (DISTINCT is not supported in window aggregates) bridged by the
    * canonical equivalence: the number of distinct values in a
    * partition equals max(dense_rank) over it, and per-row "distinct
    * so far" is the running dense_rank itself. The oracle states the
    * SAME quantity through DuckDB's native count(DISTINCT …) OVER —
    * two different formulations, one answer, which is the strongest
    * kind of grading this catalog has. Output: per customer, orders
    * placed and distinct order-months, via the window equivalence. */
  def q173WindowDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir)
      .select($"o_custkey", $"o_orderkey",
        trunc($"o_orderdate".cast("date"), "month").as("om"))
      .withColumn("dr", dense_rank().over(
        Window.partitionBy($"o_custkey").orderBy($"om")))
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n_orders"),
        max($"dr").as("distinct_months"))
      .filter($"o_custkey" <= 500)
      .orderBy($"o_custkey")
  }

  val q173Sql: String =
    """SELECT o_custkey, count(*) AS n_orders,
      |  CAST(count(DISTINCT date_trunc('month', CAST(o_orderdate AS DATE)))
      |       AS BIGINT) AS distinct_months
      |FROM orders
      |WHERE o_custkey <= 500
      |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** q179: robust dispersion — median absolute deviation per group and
    * the outlier count at the classic 3×MAD fence. q95's stddev-based
    * dispersion breaks down exactly when outliers matter (the outliers
    * inflate the stddev that is supposed to flag them); MAD is the
    * robust alternative every data-quality monitor actually uses.
    *
    * Determinism without rounding: both medians are percentile_disc —
    * COPIES of data values (q171's discipline) — and the deviation
    * |v − med| is a single IEEE subtraction of identical doubles, so
    * med, mad, and the strict 3×MAD comparison are bit-identical in
    * both engines. Two grouped order-statistics passes + two equi-joins
    * of a 5-row frame (broadcast); nothing pairwise. */
  def q179MadOutliers(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = graft.Tables.events(s, dir).select($"event_type", $"value")
    val med = e.groupBy($"event_type")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)").as("med"))
    val dev = e.join(med, Seq("event_type"))
      .withColumn("dev", abs($"value" - $"med"))
    val mad = dev.groupBy($"event_type")
      .agg(expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY dev)").as("mad"))
    dev.join(mad, Seq("event_type"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        max($"med").as("med"), max($"mad").as("mad"),
        sum(when($"dev" > $"mad" * 3, 1L).otherwise(0L)).as("n_outliers"))
      .orderBy($"event_type")
  }

  val q179Sql: String =
    """WITH ev AS (SELECT event_type, value FROM events),
      |m AS (SELECT event_type, quantile_disc(value, 0.5) AS med
      |      FROM ev GROUP BY 1),
      |d AS (SELECT ev.event_type, value, med, abs(value - med) AS dev
      |      FROM ev JOIN m USING (event_type)),
      |md AS (SELECT event_type, quantile_disc(dev, 0.5) AS mad
      |       FROM d GROUP BY 1)
      |SELECT d.event_type, count(*) AS n, max(d.med) AS med, max(md.mad) AS mad,
      |       CAST(sum(CASE WHEN dev > 3 * mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM d JOIN md USING (event_type)
      |GROUP BY d.event_type ORDER BY event_type""".stripMargin

  /** q194: per-entity z-score outlier flags with INTEGER-EXACT
    * variance — each user's events flagged against the user's OWN
    * mean/σ, but the 2σ predicate is evaluated without ever computing
    * a mean or a standard deviation: multiply through by n² and the
    * test (x − μ)² > 4σ² becomes
    * `(n·x − Σx)² > 4·(n·Σx² − (Σx)²)` — every term a BIGINT once
    * values are scaled to exact cents. The q144 integer-predicate
    * discipline generalized to second moments: no Welford-vs-naive
    * engine divergence, no floating accumulation order, just integer
    * arithmetic both engines get bit-identical. (Headroom: with cents
    * ≤ 10⁴ the dominant term (n·x − Σx)² reaches n²·10⁸, so Long only
    * holds up to n ≲ 10⁵ rows per user — beyond that the product
    * passes 2⁶³ and non-ANSI BIGINT arithmetic would wrap silently,
    * flipping flags with no error; a 100 TB deployment with bigger
    * per-key masses moves the same predicate to DECIMAL(38) unchanged.)
    *
    * Population σ (÷n) — stated here because the sample/population
    * choice changes flags near the fence. */
  def q194ZscoreFlags(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = graft.Tables.events(s, dir)
      .select($"user_id",
        round($"value" * 100, 0).cast("long").as("xc"))
    val stats = e.groupBy($"user_id")
      .agg(count(lit(1)).as("n"), sum($"xc").as("sx"),
        sum($"xc" * $"xc").as("sx2"))
    e.join(stats, Seq("user_id"))
      .withColumn("flag",
        ($"n" * $"xc" - $"sx") * ($"n" * $"xc" - $"sx") >
          ($"n" * $"sx2" - $"sx" * $"sx") * 4)
      .groupBy($"user_id")
      .agg(max($"n").as("n"),
        sum(when($"flag", 1L).otherwise(0L)).as("n_outliers"))
      .filter($"user_id" <= 50)
      .orderBy($"user_id")
  }

  val q194Sql: String =
    """WITH e AS (
      |  SELECT user_id, CAST(round(value * 100, 0) AS BIGINT) AS xc
      |  FROM events),
      |st AS (
      |  SELECT user_id, count(*) AS n, CAST(sum(xc) AS BIGINT) AS sx,
      |         CAST(sum(xc * xc) AS BIGINT) AS sx2
      |  FROM e GROUP BY user_id)
      |SELECT e.user_id, max(st.n) AS n,
      |  CAST(sum(CASE WHEN (st.n * e.xc - st.sx) * (st.n * e.xc - st.sx)
      |                   > (st.n * st.sx2 - st.sx * st.sx) * 4
      |            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM e JOIN st USING (user_id)
      |WHERE e.user_id <= 50
      |GROUP BY e.user_id ORDER BY user_id""".stripMargin

  /** q209: IQR (Tukey) fences — the boxplot's outlier rule per event
    * type: Q1/Q3 as discrete percentiles (copies of data values, q171's
    * discipline), whiskers at 1.5×IQR, and the count outside either
    * fence. Completes the robust-dispersion triad: q95 stddev (classic,
    * outlier-sensitive), q179 MAD (median-based), q209 IQR
    * (quartile-based — the one every boxplot draws). The fence
    * comparison is double arithmetic on IDENTICAL inputs (Q1/Q3 are
    * data copies; 1.5×IQR is one multiply), so the counts are exact. */
  def q209IqrFences(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = graft.Tables.events(s, dir).select($"event_type", $"value")
    val q = e.groupBy($"event_type")
      .agg(expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY value)").as("q1"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY value)").as("q3"))
      .withColumn("lo", $"q1" - ($"q3" - $"q1") * 1.5)
      .withColumn("hi", $"q3" + ($"q3" - $"q1") * 1.5)
    e.join(q, Seq("event_type"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        max($"q1").as("q1"), max($"q3").as("q3"),
        sum(when($"value" < $"lo" || $"value" > $"hi", 1L).otherwise(0L))
          .as("n_outside"))
      .orderBy($"event_type")
  }

  val q209Sql: String =
    """WITH ev AS (SELECT event_type, value FROM events),
      |q AS (
      |  SELECT event_type,
      |    quantile_disc(value, 0.25) AS q1,
      |    quantile_disc(value, 0.75) AS q3
      |  FROM ev GROUP BY 1),
      |f AS (SELECT event_type, q1, q3,
      |        q1 - (q3 - q1) * 1.5 AS lo, q3 + (q3 - q1) * 1.5 AS hi
      |      FROM q)
      |SELECT ev.event_type, count(*) AS n, max(f.q1) AS q1, max(f.q3) AS q3,
      |  CAST(sum(CASE WHEN value < lo OR value > hi THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_outside
      |FROM ev JOIN f USING (event_type)
      |GROUP BY ev.event_type ORDER BY event_type""".stripMargin

  /** q219: two-sample KOLMOGOROV–SMIRNOV drift test between the q100
    * hash split's train and val length distributions — "did my split
    * shift the data?" answered with an exact order statistic instead of
    * eyeballed histograms. D = sup_x |F_train(x) − F_val(x)|, computed
    * EXACTLY and almost entirely in integers: per distinct length, the
    * per-split running counts, then one max over
    * |cum_tr·n_val − cum_val·n_train| — an INTEGER sup (no FP inside
    * the max), divided once at the end for the rounded D. The reject
    * flag applies the classical 95% critical value
    * D > 1.358·√((n+m)/(n·m)), squared into
    * gap² > 1.358²·(n+m)·n·m so the comparison is one deterministic
    * expression on both engines.
    *
    * Scale: the per-length census is bounded by DISTINCT lengths, not
    * documents — 10⁹ docs reduce to one narrow aggregation plus a
    * window over ~thousands of census rows (a single ordered partition
    * over a domain-bounded table, q85's discipline, not a data-scale
    * sort). Integer headroom: gap ≤ n·m, so Long holds to ~3×10⁹ docs
    * per split; past that the same predicate moves to DECIMAL(38).
    * The SQUARED fence, though, is double arithmetic on both engines
    * (the DuckDB literal is CAST to DOUBLE so neither side silently
    * promotes to DECIMAL): gap² is exact in double only while
    * gap ≤ 2²⁶·√2 ≈ 9.4×10⁷, i.e. n·m ≤ 2⁵³ after squaring — near
    * the critical value beyond that, both engines round the SAME way
    * on the same product, so the flags still agree, but the fence
    * itself is ±1 ulp; the DECIMAL(38) move covers it too. */
  def q219KsSplitDrift(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bucket = substring(md5($"doc_id".cast("string")), 1, 1)
    val census = graft.Tables.documents(s, dir)
      .withColumn("split",
        when(bucket.isin("c", "d"), "val")
          .when(bucket.isin("e", "f"), "test")
          .otherwise("train"))
      .filter($"split".isin("train", "val"))
      .groupBy($"n_chars")
      .agg(sum(when($"split" === "train", 1L).otherwise(0L)).as("ctr"),
        sum(when($"split" === "val", 1L).otherwise(0L)).as("cva"))
    val totals = census.agg(sum($"ctr").as("n_tr"), sum($"cva").as("n_va"))
    val w = Window.orderBy($"n_chars")
      .rowsBetween(Window.unboundedPreceding, 0)
    census
      .withColumn("cum_tr", sum($"ctr").over(w))
      .withColumn("cum_va", sum($"cva").over(w))
      .crossJoin(broadcast(totals))
      .groupBy($"n_tr", $"n_va")
      .agg(max(abs($"cum_tr" * $"n_va" - $"cum_va" * $"n_tr")).as("gap"))
      .select(
        $"n_tr".as("n_train"), $"n_va".as("n_val"),
        round($"gap".cast("double") / ($"n_tr" * $"n_va"), 6).as("ks_d"),
        ($"gap".cast("double") * $"gap" >
          lit(1.844164) * ($"n_tr" + $"n_va") * $"n_tr" * $"n_va")
          .as("reject_95"))
  }

  val q219Sql: String =
    """WITH d AS (
      |  SELECT n_chars,
      |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d') THEN 'val'
      |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e','f') THEN 'test'
      |         ELSE 'train' END AS split
      |  FROM documents),
      |c AS (
      |  SELECT n_chars,
      |    CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT) AS ctr,
      |    CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT) AS cva
      |  FROM d WHERE split IN ('train', 'val') GROUP BY 1),
      |r AS (
      |  SELECT
      |    CAST(sum(ctr) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tr,
      |    CAST(sum(cva) OVER (ORDER BY n_chars ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_va
      |  FROM c),
      |t AS (SELECT CAST(sum(ctr) AS BIGINT) AS n_tr, CAST(sum(cva) AS BIGINT) AS n_va FROM c),
      |g AS (
      |  SELECT CAST(max(abs(r.cum_tr * t.n_va - r.cum_va * t.n_tr)) AS BIGINT) AS gap
      |  FROM r, t)
      |SELECT t.n_tr AS n_train, t.n_va AS n_val,
      |  round(CAST(g.gap AS DOUBLE) / (t.n_tr * t.n_va), 6) AS ks_d,
      |  CAST(g.gap AS DOUBLE) * g.gap
      |    > CAST(1.844164 AS DOUBLE) * (t.n_tr + t.n_va) * t.n_tr * t.n_va AS reject_95
      |FROM g, t""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q219_ks_split_drift" -> (q219KsSplitDrift _),
    "q209_iqr_fences"    -> (q209IqrFences _),
    "q194_zscore_flags"  -> (q194ZscoreFlags _),
    "q179_mad_outliers"  -> (q179MadOutliers _),
    "q98_bit_ops"        -> (q98BitOps _),
    "q139_quantile_sketch" -> (q139QuantileSketch _),
    "q151_heavy_hitters" -> (q151HeavyHitters _),
    "q158_column_stats"  -> (q158ColumnStats _),
    "q163_constraint_audit" -> (q163ConstraintAudit _),
    "q171_percentile_disc" -> (q171PercentileDisc _),
    "q172_mode_per_group" -> (q172ModePerGroup _),
    "q173_window_distinct" -> (q173WindowDistinct _),
    "q99_chained_cte"    -> (q99ChainedCte _),
    "q97_try_ops"        -> (q97TryOps _),
    "q88_grouped_exists" -> (q88GroupedExists _),
    "q90_multicol_in"    -> (q90MultiColIn _),
    "q91_case_order"     -> (q91CaseOrder _),
    "q92_word_freq"      -> (q92WordFreq _),
    "q93_arg_max"        -> (q93ArgMax _),
    "q94_bool_agg"       -> (q94BoolAgg _),
    "q95_dispersion"     -> (q95Dispersion _),
    "q96_correlation"    -> (q96Correlation _),
  )

  val oracle: Map[String, String] = Map(
    "q219_ks_split_drift" -> q219Sql,
    "q209_iqr_fences"    -> q209Sql,
    "q194_zscore_flags"  -> q194Sql,
    "q179_mad_outliers"  -> q179Sql,
    "q98_bit_ops"        -> q98Sql,
    "q139_quantile_sketch" -> q139Sql,
    "q151_heavy_hitters" -> q151Sql,
    "q158_column_stats"  -> q158Sql,
    "q163_constraint_audit" -> q163Sql,
    "q171_percentile_disc" -> q171Sql,
    "q172_mode_per_group" -> q172Sql,
    "q173_window_distinct" -> q173Sql,
    "q99_chained_cte"    -> q99Sql,
    "q97_try_ops"        -> q97Sql,
    "q88_grouped_exists" -> q88Sql,
    "q90_multicol_in"    -> q90Sql,
    "q91_case_order"     -> q91Sql,
    "q92_word_freq"      -> q92Sql,
    "q93_arg_max"        -> q93Sql,
    "q94_bool_agg"       -> q94Sql,
    "q95_dispersion"     -> q95Sql,
    "q96_correlation"    -> q96Sql,
  )
}
