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

  /** q145: SCD2 interval construction — the warehouse upsert shape: a
    * per-user change stream collapses to slowly-changing-dimension
    * version rows with [valid_from, valid_to) validity and a current
    * flag. Consecutive duplicates are suppressed BEFORE interval
    * assembly (a change row opens a version; a repeat extends it), and
    * valid_to is the NEXT change's valid_from — so intervals tile each
    * user's timeline exactly, no gaps, no overlaps (pinned in
    * RelationalSpec). Ties at equal ts break by event_id on both
    * sides. One window pass for change detection, one for the
    * interval close — both partitioned by user, no self-join. */
  def q145Scd2Intervals(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, dir)
      .select($"user_id", $"event_id", $"event_type",
        $"ts".cast("timestamp").as("ts"))
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val changes = ev
      .withColumn("prev", lag($"event_type", 1).over(w))
      .filter($"prev".isNull || $"prev" =!= $"event_type")
    val w2 = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    changes
      .withColumn("valid_to", lead($"ts", 1).over(w2))
      .select($"user_id", $"event_type".as("state"),
        $"ts".as("valid_from"), $"valid_to",
        $"valid_to".isNull.as("is_current"))
      .orderBy($"user_id", $"valid_from")
  }

  val q145Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events),
      |changes AS (
      |  SELECT * FROM (
      |    SELECT user_id, event_id, event_type, ts,
      |      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |    FROM ev) t
      |  WHERE prev IS NULL OR prev <> event_type)
      |SELECT user_id, event_type AS state, ts AS valid_from,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
      |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
      |FROM changes
      |ORDER BY user_id, valid_from""".stripMargin

  /** q146: join-key skew report — the diagnostic you run BEFORE sizing
    * a 100 TB join: the 20 heaviest l_partkey values with their share
    * of total rows and the running cumulative share (in rank order, so
    * the fold is deterministic). One keyed count (map-side combined),
    * one broadcast total, one 20-row window — the report costs one
    * scan regardless of input size. */
  def q146SkewReport(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir)
    val total = li.agg(count(lit(1)).as("total"))
    val wr = Window.orderBy($"cnt".desc, $"l_partkey".asc)
    val wc = Window.orderBy($"cnt".desc, $"l_partkey".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    li.groupBy($"l_partkey").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(wr))
      .filter($"rank" <= 20)
      .withColumn("share", round($"cnt" / $"total", 6))
      .withColumn("cum_share", round(sum($"cnt").over(wc) / $"total", 6))
      .select($"rank", $"l_partkey", $"cnt", $"share", $"cum_share")
      .orderBy($"rank")
  }

  val q146Sql: String =
    """WITH c AS (SELECT l_partkey, count(*) AS cnt FROM lineitem GROUP BY 1),
      |t AS (SELECT count(*) AS total FROM lineitem),
      |ranked AS (
      |  SELECT l_partkey, cnt, total,
      |    row_number() OVER (ORDER BY cnt DESC, l_partkey ASC) AS rank,
      |    sum(cnt) OVER (ORDER BY cnt DESC, l_partkey ASC
      |                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM c, t)
      |SELECT rank, l_partkey, cnt,
      |  round(cnt / total, 6) AS share,
      |  round(cum / total, 6) AS cum_share
      |FROM ranked WHERE rank <= 20 ORDER BY rank""".stripMargin

  /** q149: point-in-time dimension lookup — `FOR SYSTEM_TIME AS OF`
    * semantics: each purchase enriched with the SCD2 state (q145's
    * versions) valid AT the purchase's own timestamp. Because q145's
    * intervals tile each user's timeline (pinned in RelationalSpec),
    * interval containment is EQUIVALENT to a backward as-of on
    * valid_from — so the engine runs one `AsOfJoinExec` pass (O(1)
    * candidate state, no event × versions range-join blowup) while
    * the oracle states the containment predicate directly
    * (`valid_from ≤ ts < valid_to`): two different formulations that
    * must agree row-for-row, which is the grading value.
    *
    * Tie note: two versions sharing (user, valid_from) would make the
    * backward match ambiguous where containment is not (the earlier
    * one's interval is empty). Impossible here — version starts are
    * microsecond event times and the corpus has zero same-user
    * same-ts change pairs (checked) — but a source with coarser time
    * granularity must pre-collapse same-instant changes to the last
    * one (by event_id) before interval assembly. */
  def q149PitLookup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val dim = q145Scd2Intervals(s, dir)
      .select($"user_id".as("du"), $"state", $"valid_from")
    val ev = Tables.events(s, dir)
      .filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts".cast("timestamp").as("ts"))
    graft.plans.AsOf.join(ev, dim,
        leftKeys = Seq("user_id"), rightKeys = Seq("du"),
        leftTimeCol = "ts", rightTimeCol = "valid_from")
      .select($"event_id", $"state")
      .orderBy($"event_id")
  }

  val q149Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type, CAST(ts AS TIMESTAMP) AS ts
      |  FROM events),
      |changes AS (
      |  SELECT * FROM (
      |    SELECT user_id, event_id, event_type, ts,
      |      lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
      |    FROM ev) t
      |  WHERE prev IS NULL OR prev <> event_type),
      |versions AS (
      |  SELECT user_id, event_type AS state, ts AS valid_from,
      |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
      |  FROM changes)
      |SELECT e.event_id, v.state
      |FROM ev e JOIN versions v
      |  ON e.user_id = v.user_id AND v.valid_from <= e.ts
      | AND (v.valid_to IS NULL OR e.ts < v.valid_to)
      |WHERE e.event_type = 'purchase'
      |ORDER BY e.event_id""".stripMargin

  /** q154: CDC MERGE apply — the lakehouse upsert: a snapshot plus a
    * keyed change stream (multiple versions per key, each an update or
    * a delete) folded into the next snapshot by LATEST-WINS semantics.
    * The change stream here is derived from lineitem (key = order,
    * version = line number, returnflag R ⇒ delete else update-price) so
    * both engines see the same deterministic deltas. Two stages, both
    * the canonical scale shape: (1) latest-per-key — row_number over
    * (key ORDER BY version DESC), the same hash shuffle any MERGE pays;
    * (2) one FULL OUTER equality join of snapshot vs latest deltas ON
    * THE SAME KEY — co-partitioned with stage 1's exchange, so the
    * merge adds no second shuffle. Untouched rows pass through
    * (op IS NULL), latest-delete drops the row, latest-update rewrites
    * the payload, and a delta key absent from the snapshot inserts
    * (empty on this corpus — lineitem keys ⊆ orders — but the outer
    * join IS the general contract). Graded as per-month row counts,
    * decimal-exact totals, and an integer key checksum that any wrong
    * keep/drop/update decision moves. */
  def q154CdcApply(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.orders(s, dir)
      .select($"o_orderkey".as("k"), $"o_totalprice".as("price"), $"o_orderdate")
    val cdc = Tables.lineitem(s, dir)
      .filter(pmod($"l_orderkey", lit(4)) === 0)
      .select($"l_orderkey".as("ck"), $"l_linenumber".as("seq"),
        when($"l_returnflag" === "R", "D").otherwise("U").as("op"),
        $"l_extendedprice".as("new_price"))
    // The version stamp is NOT unique in this corpus (duplicate
    // (orderkey, linenumber) pairs exist), so the winner is picked by a
    // TOTAL order on (version, payload): equal-version events fall back
    // to op then price. Fully-identical events then yield an identical
    // outcome whichever row wins — merge determinism that survives a
    // real CDC stream's duplicated version stamps.
    val latest = cdc
      .withColumn("rn", row_number().over(
        Window.partitionBy($"ck")
          .orderBy($"seq".desc, $"op".asc, $"new_price".desc)))
      .filter($"rn" === 1)
    base.join(latest, $"k" === $"ck", "full_outer")
      .filter($"op".isNull || $"op" === "U")
      .select(coalesce($"k", $"ck").as("okey"),
        when($"op" === "U", $"new_price").otherwise($"price").as("price"),
        $"o_orderdate")
      .groupBy(trunc($"o_orderdate", "month").as("month"))
      .agg(count(lit(1)).as("n_rows"),
        round(dsum($"price"), 2).as("total_price"),
        sum($"okey").as("key_checksum"))
      .orderBy($"month")
  }

  val q154Sql: String =
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_totalprice AS price, o_orderdate FROM orders),
      |cdc AS (
      |  SELECT l_orderkey AS ck, l_linenumber AS seq,
      |    CASE WHEN l_returnflag = 'R' THEN 'D' ELSE 'U' END AS op,
      |    l_extendedprice AS new_price
      |  FROM lineitem WHERE l_orderkey % 4 = 0),
      |latest AS (
      |  SELECT * FROM (
      |    SELECT cdc.*, row_number() OVER (
      |      PARTITION BY ck ORDER BY seq DESC, op ASC, new_price DESC) AS rn
      |    FROM cdc) t WHERE rn = 1),
      |m AS (
      |  SELECT coalesce(k, ck) AS okey,
      |    CASE WHEN op = 'U' THEN new_price ELSE price END AS price,
      |    o_orderdate
      |  FROM base FULL OUTER JOIN latest ON k = ck
      |  WHERE op IS NULL OR op = 'U')
      |SELECT date_trunc('month', o_orderdate) AS month, count(*) AS n_rows,
      |  round(CAST(sum(CAST(price AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_price,
      |  CAST(sum(okey) AS BIGINT) AS key_checksum
      |FROM m GROUP BY 1 ORDER BY month""".stripMargin

  /** q164: date-spine gap filling — the calendar-dimension operator a
    * reporting layer needs because "days with zero orders" do not
    * exist as rows: generate the full day spine between the data's
    * min and max date, left-join the daily aggregate onto it, and
    * report per month the active/zero day split plus the LONGEST
    * zero-day run (gaps-and-islands on the day ordinal, windowed per
    * month). The spine generation is one `sequence()` explode off a
    * 1-row extent aggregate — rows ∝ calendar days, never data — and
    * everything after is one left join + keyed aggregation. */
  def q164DateSpine(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
    val daily = orders.groupBy($"o_orderdate".as("day"))
      .agg(count(lit(1)).as("n"))
    val spine = orders
      .agg(min($"o_orderdate").as("lo"), max($"o_orderdate").as("hi"))
      .select(explode(sequence($"lo", $"hi")).as("day"))
    val j = spine.join(daily, Seq("day"), "left_outer")
      .select($"day", coalesce($"n", lit(0L)).as("n"))
      .persist() // month rollup + zero-run islands
    val gaps = j.filter($"n" === 0)
      .withColumn("grp",
        datediff($"day", lit("1970-01-01").cast("date")) -
          row_number().over(Window
            .partitionBy(trunc($"day", "month")).orderBy($"day")))
      .groupBy(trunc($"day", "month").as("month"), $"grp")
      .agg(count(lit(1)).as("run"))
      .groupBy($"month").agg(max($"run").as("max_gap"))
    j.groupBy(trunc($"day", "month").as("month"))
      .agg(count(lit(1)).as("n_days"),
        sum(when($"n" > 0, 1L).otherwise(0L)).as("active_days"),
        sum(when($"n" === 0, 1L).otherwise(0L)).as("zero_days"),
        sum($"n").as("n_orders"))
      .join(gaps, Seq("month"), "left_outer")
      .select($"month", $"n_days", $"active_days", $"zero_days", $"n_orders",
        coalesce($"max_gap", lit(0L)).as("max_gap"))
      .orderBy($"month")
  }

  val q164Sql: String =
    """WITH daily AS (
      |  SELECT o_orderdate AS day, count(*) AS n FROM orders GROUP BY 1),
      |ext AS (SELECT min(o_orderdate) AS lo, max(o_orderdate) AS hi FROM orders),
      |spine AS (
      |  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
      |           CAST(hi AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM ext),
      |j AS (SELECT spine.day, coalesce(daily.n, 0) AS n
      |      FROM spine LEFT JOIN daily ON spine.day = daily.day),
      |z AS (
      |  SELECT CAST(date_trunc('month', day) AS DATE) AS month,
      |    (day - DATE '1970-01-01')
      |      - row_number() OVER (PARTITION BY date_trunc('month', day)
      |                           ORDER BY day) AS grp
      |  FROM j WHERE n = 0),
      |runs AS (SELECT month, grp, count(*) AS run FROM z GROUP BY month, grp),
      |gaps AS (SELECT month, max(run) AS max_gap FROM runs GROUP BY month),
      |m AS (
      |  SELECT CAST(date_trunc('month', day) AS DATE) AS month,
      |    count(*) AS n_days,
      |    CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS active_days,
      |    CAST(sum(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zero_days,
      |    CAST(sum(n) AS BIGINT) AS n_orders
      |  FROM j GROUP BY 1)
      |SELECT m.month, m.n_days, m.active_days, m.zero_days, m.n_orders,
      |  coalesce(gaps.max_gap, 0) AS max_gap
      |FROM m LEFT JOIN gaps ON m.month = gaps.month
      |ORDER BY m.month""".stripMargin

  /** q167: per-month order-volume TREND — least-squares slope of daily
    * order counts against the day ordinal, the "is this metric rising"
    * primitive behind every monitoring dashboard. The whole regression
    * is four integer sums (Σx, Σy, Σxy, Σx² over exact BIGINTs — all
    * far below 2^63 at any month size) folded map-side like any sum;
    * the closed form (n·Σxy − Σx·Σy)/(n·Σx² − (Σx)²) divides ONCE at
    * the end, so the slope is a ratio of exact integers — identical
    * doubles in both engines with no decimal scaffolding (q141's
    * determinism-by-arithmetic-class discipline). Single-active-day
    * months have a zero denominator and report NULL explicitly. */
  def q167TrendSlope(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val daily = Tables.orders(s, dir)
      .groupBy($"o_orderdate".cast("date").as("day"))
      .agg(count(lit(1)).as("y"))
      .withColumn("x",
        datediff($"day", lit("1970-01-01").cast("date")).cast("long"))
    daily.groupBy(trunc($"day", "month").as("month"))
      .agg(count(lit(1)).as("n"),
        sum($"y").as("sy"),
        sum($"x").as("sx"),
        sum($"x" * $"y").as("sxy"),
        sum($"x" * $"x").as("sxx"))
      .select($"month", $"n", $"sy".as("n_orders"),
        when($"n" * $"sxx" - $"sx" * $"sx" === 0, lit(null))
          .otherwise(round(
            ($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
              ($"n" * $"sxx" - $"sx" * $"sx"), 6)).as("slope"))
      .orderBy($"month")
  }

  val q167Sql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS y
      |  FROM orders GROUP BY 1),
      |xy AS (
      |  SELECT CAST(date_trunc('month', day) AS DATE) AS month,
      |    CAST(day - DATE '1970-01-01' AS BIGINT) AS x, y
      |  FROM daily),
      |m AS (
      |  SELECT month, count(*) AS n, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(x * y) AS BIGINT) AS sxy,
      |    CAST(sum(x * x) AS BIGINT) AS sxx
      |  FROM xy GROUP BY month)
      |SELECT month, n, sy AS n_orders,
      |  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
      |       ELSE round(CAST(n * sxy - sx * sy AS DOUBLE)
      |                  / (n * sxx - sx * sx), 6) END AS slope
      |FROM m ORDER BY month""".stripMargin

  /** q168: NULL join-key semantics — the three ways an engine can
    * treat NULL keys at a join, graded side by side on the same
    * deliberately-small keyed slices (null-key populations CROSS
    * under null-safe equality, so a production pipeline either
    * filters or sentinels them — which is exactly what this report
    * makes visible): plain equality (NULL matches nothing),
    * null-safe equality (Spark `<=>` ≡ DuckDB IS NOT DISTINCT FROM:
    * NULL matches NULL), and coalesce-to-sentinel (the workaround
    * pattern, equivalent to null-safe when the sentinel is free).
    * One (kind, n_rows, checksum) row per semantics. */
  def q168NullSafeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val a = Tables.orders(s, dir)
      .filter(pmod($"o_orderkey", lit(13)) === 0)
      .select($"o_orderkey",
        when(pmod($"o_orderkey", lit(7)) === 0, lit(null))
          .otherwise(pmod($"o_orderkey", lit(100))).as("ka"))
    val b = Tables.customer(s, dir)
      .filter(pmod($"c_custkey", lit(11)) === 0)
      .select($"c_custkey",
        when(pmod($"c_custkey", lit(5)) === 0, lit(null))
          .otherwise(pmod($"c_custkey", lit(100))).as("kb"))
    def report(kind: String, j: DataFrame): DataFrame =
      j.agg(count(lit(1)).as("n_rows"),
          coalesce(sum($"o_orderkey" + $"c_custkey"), lit(0L)).as("checksum"))
        .select(lit(kind).as("join_kind"), $"n_rows", $"checksum")
    report("equality", a.join(b, $"ka" === $"kb"))
      .unionByName(report("null_safe", a.join(b, $"ka" <=> $"kb")))
      .unionByName(report("sentinel",
        a.join(b, coalesce($"ka", lit(-1)) === coalesce($"kb", lit(-1)))))
      .orderBy($"join_kind")
  }

  val q168Sql: String =
    """WITH a AS (
      |  SELECT o_orderkey,
      |    CASE WHEN o_orderkey % 7 = 0 THEN NULL
      |         ELSE o_orderkey % 100 END AS ka
      |  FROM orders WHERE o_orderkey % 13 = 0),
      |b AS (
      |  SELECT c_custkey,
      |    CASE WHEN c_custkey % 5 = 0 THEN NULL
      |         ELSE c_custkey % 100 END AS kb
      |  FROM customer WHERE c_custkey % 11 = 0)
      |SELECT * FROM (
      |  SELECT 'equality' AS join_kind, count(*) AS n_rows,
      |    CAST(coalesce(sum(o_orderkey + c_custkey), 0) AS BIGINT) AS checksum
      |  FROM a JOIN b ON a.ka = b.kb
      |  UNION ALL
      |  SELECT 'null_safe', count(*),
      |    CAST(coalesce(sum(o_orderkey + c_custkey), 0) AS BIGINT)
      |  FROM a JOIN b ON a.ka IS NOT DISTINCT FROM b.kb
      |  UNION ALL
      |  SELECT 'sentinel', count(*),
      |    CAST(coalesce(sum(o_orderkey + c_custkey), 0) AS BIGINT)
      |  FROM a JOIN b ON coalesce(a.ka, -1) = coalesce(b.kb, -1)) u
      |ORDER BY join_kind""".stripMargin

  /** q178: ordered LISTAGG — Spark 4's `listagg(…) WITHIN GROUP
    * (ORDER BY …)` against DuckDB's `string_agg(…, sep ORDER BY …)`:
    * the report-surface aggregate that renders a group's members as
    * one delimited string. The ORDER BY inside the aggregate is what
    * makes it gradable — an unordered listagg is nondeterministic
    * under any parallel execution (concat order follows partition
    * arrival), so the catalog's rule is the tie order lives IN the
    * query text (q172's discipline). Listagg is inherently a
    * small-group operator — the output string is the group — so the
    * grouped sets here are dimension-sized; at 100 TB one caps or
    * samples members per group before rendering, never listaggs a
    * fact table. */
  def q178Listagg(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val n = Tables.nation(s, dir)
    val r = Tables.region(s, dir)
    r.join(n, n("n_regionkey") === r("r_regionkey"))
      .groupBy($"r_name")
      .agg(count(lit(1)).as("n_nations"),
        expr("listagg(n_name, ',') WITHIN GROUP (ORDER BY n_name)").as("nations"))
      .orderBy($"r_name")
  }

  val q178Sql: String =
    """SELECT r_name, count(*) AS n_nations,
      |       string_agg(n_name, ',' ORDER BY n_name) AS nations
      |FROM region JOIN nation ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** q191: RELATIONAL DIVISION — "which customers have placed orders
    * in EVERY priority class": the classic ÷ operator SQL never got a
    * keyword for. Spark side states it as the count-match reduction
    * (distinct priorities per customer = total distinct priorities —
    * one aggregation + a broadcast scalar, the efficient form at any
    * scale); the ORACLE states it as the textbook double-NOT-EXISTS.
    * Two canonical formulations of division, one hash — the strongest
    * grading shape this catalog has (q173's precedent).
    *
    * Output also carries the order count so the row is a report, not
    * a bare id list. */
  def q191RelationalDivision(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val orders = Tables.orders(s, dir)
    val nPrio = orders.select(countDistinct($"o_orderpriority").as("np"))
    orders.groupBy($"o_custkey")
      .agg(countDistinct($"o_orderpriority").as("covered"),
        count(lit(1)).as("n_orders"))
      .crossJoin(broadcast(nPrio))
      .filter($"covered" === $"np")
      .select($"o_custkey", $"n_orders")
      .orderBy($"o_custkey")
  }

  val q191Sql: String =
    """SELECT o_custkey, count(*) AS n_orders
      |FROM orders o
      |GROUP BY o_custkey
      |HAVING NOT EXISTS (
      |  SELECT 1 FROM (SELECT DISTINCT o_orderpriority AS p FROM orders) ps
      |  WHERE NOT EXISTS (
      |    SELECT 1 FROM orders i
      |    WHERE i.o_custkey = o.o_custkey AND i.o_orderpriority = ps.p))
      |ORDER BY o_custkey""".stripMargin

  /** q192: carry-forward imputation via IGNORE NULLS — the window form
    * of last-observation-carried-forward: each event carries the most
    * recent non-null reading of its user (error events null their
    * reading out). Spark's `last(col, ignoreNulls=true)` over a
    * running frame against DuckDB's `last_value(… IGNORE NULLS)` —
    * operator parity for the imputation primitive q143 expresses with
    * an as-of join when the grid, not the event stream, is the spine. */
  def q192IgnoreNulls(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      .rowsBetween(Window.unboundedPreceding, 0)
    Tables.events(s, dir)
      .withColumn("reading",
        when($"event_type" === "error", lit(null)).otherwise($"value"))
      .withColumn("carried", last($"reading", ignoreNulls = true).over(w))
      .select($"event_id", $"user_id", $"reading", $"carried")
      .orderBy($"event_id")
  }

  val q192Sql: String =
    """WITH ev AS (
      |  SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
      |    CASE WHEN event_type = 'error' THEN NULL ELSE value END AS reading
      |  FROM events)
      |SELECT event_id, user_id, reading,
      |  last_value(reading IGNORE NULLS) OVER (
      |    PARTITION BY user_id ORDER BY ts, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS carried
      |FROM ev ORDER BY event_id""".stripMargin

  /** q196: SNAPSHOT DIFF — table reconciliation between two versions
    * of the orders table: per change class (added / deleted / changed /
    * unchanged) the row count, plus how many changed rows touched the
    * price vs the status column. The audit a lakehouse runs after a
    * CDC apply (q154) to state WHAT the merge did; the "new" snapshot
    * here is a deterministic mutation of the base (keys ≡0 mod 7
    * deleted, ≡0 mod 5 repriced +1.00, ≡0 mod 11 re-inserted shifted
    * by 10⁹ — rules in the query text, identical in the oracle).
    *
    * Shape: ONE full-outer co-partitioned join on the key, a CASE
    * classifier, one aggregation — the diff never materializes both
    * snapshots twice. All comparisons are exact (price mutation is
    * +1.00 on a 2-decimal value). */
  def q196SnapshotDiff(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val base = Tables.orders(s, dir)
      .select($"o_orderkey".as("k"), $"o_totalprice".as("price_a"),
        $"o_orderstatus".as("status_a"))
    val newSnap = Tables.orders(s, dir)
      .filter($"o_orderkey" % 7 =!= 0)
      .select($"o_orderkey".as("k"),
        when($"o_orderkey" % 5 === 0, $"o_totalprice" + 1.0)
          .otherwise($"o_totalprice").as("price_b"),
        $"o_orderstatus".as("status_b"))
      .unionByName(
        Tables.orders(s, dir).filter($"o_orderkey" % 11 === 0)
          .select(($"o_orderkey" + 1000000000L).as("k"),
            $"o_totalprice".as("price_b"), $"o_orderstatus".as("status_b")))
    base.join(newSnap, Seq("k"), "full_outer")
      .withColumn("change_class",
        when($"price_a".isNull, "added")
          .when($"price_b".isNull, "deleted")
          .when($"price_a" =!= $"price_b" || $"status_a" =!= $"status_b", "changed")
          .otherwise("unchanged"))
      .groupBy($"change_class")
      .agg(count(lit(1)).as("n"),
        sum(when($"price_a".isNotNull && $"price_b".isNotNull &&
          $"price_a" =!= $"price_b", 1L).otherwise(0L)).as("price_changed"),
        sum(when($"status_a".isNotNull && $"status_b".isNotNull &&
          $"status_a" =!= $"status_b", 1L).otherwise(0L)).as("status_changed"))
      .orderBy($"change_class")
  }

  val q196Sql: String =
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_totalprice AS price_a, o_orderstatus AS status_a
      |  FROM orders),
      |news AS (
      |  SELECT o_orderkey AS k,
      |    CASE WHEN o_orderkey % 5 = 0 THEN o_totalprice + 1.0
      |         ELSE o_totalprice END AS price_b,
      |    o_orderstatus AS status_b
      |  FROM orders WHERE o_orderkey % 7 <> 0
      |  UNION ALL
      |  SELECT o_orderkey + 1000000000, o_totalprice, o_orderstatus
      |  FROM orders WHERE o_orderkey % 11 = 0),
      |j AS (
      |  SELECT base.k AS ka, news.k AS kb, price_a, price_b, status_a, status_b
      |  FROM base FULL OUTER JOIN news ON base.k = news.k)
      |SELECT
      |  CASE WHEN price_a IS NULL THEN 'added'
      |       WHEN price_b IS NULL THEN 'deleted'
      |       WHEN price_a <> price_b OR status_a <> status_b THEN 'changed'
      |       ELSE 'unchanged' END AS change_class,
      |  count(*) AS n,
      |  CAST(sum(CASE WHEN price_a IS NOT NULL AND price_b IS NOT NULL
      |                 AND price_a <> price_b THEN 1 ELSE 0 END) AS BIGINT) AS price_changed,
      |  CAST(sum(CASE WHEN status_a IS NOT NULL AND status_b IS NOT NULL
      |                 AND status_a <> status_b THEN 1 ELSE 0 END) AS BIGINT) AS status_changed
      |FROM j GROUP BY 1 ORDER BY change_class""".stripMargin

  /** q197: EQUI-DEPTH histogram — ntile(10) over a TOTAL order
    * (price, key — the tie column makes tile assignment deterministic,
    * q172's discipline): per decile, its row count and its max price
    * (a real data value, so the boundary column is hash-exact with no
    * rounding). The ANALYZE-histogram complement of q83's equi-width
    * bins and q158's column profile — equi-depth is what an optimizer
    * actually keeps, because every bucket carries the same row mass no
    * matter how skewed the values.
    *
    * Scale note: a global ntile is a single ordered partition — the
    * exact DEFINITION, kept because the oracle grades it. The 100 TB
    * production form is REGISTERED AND GRADED as q213: the same
    * equi-depth semantics from approx_percentile boundaries (GK
    * sketch, mergeable partials, no total order), with the q139-style
    * sketch-accuracy boolean as the graded contract. */
  def q197EquidepthHist(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.orderBy($"o_totalprice", $"o_orderkey")
    Tables.orders(s, dir)
      .select($"o_orderkey", $"o_totalprice")
      .withColumn("decile", ntile(10).over(w))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n"), max($"o_totalprice").as("hi_bound"))
      .orderBy($"decile")
  }

  val q197Sql: String =
    """SELECT decile, count(*) AS n, max(o_totalprice) AS hi_bound
      |FROM (
      |  SELECT o_totalprice,
      |    ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
      |  FROM orders) t
      |GROUP BY decile ORDER BY decile""".stripMargin

  /** q207: PPS SYSTEMATIC sampling — probability-proportional-to-size
    * selection done deterministically: per source, walk the documents
    * in doc_id order, accumulate their byte sizes, and select the
    * document whose cumulative range covers each of 5 evenly-spaced
    * thresholds (midpoints `(2j+1)·W div 10` — integer arithmetic, no
    * RNG). Big documents are proportionally more likely to own a
    * threshold: the survey-sampling estimator behind size-weighted
    * corpus audits, with q85's determinism discipline (the "random"
    * start is a fixed midpoint, stated in the query text).
    *
    * One window cumsum per source + a range condition per threshold —
    * thresholds are a 5-row broadcast, so the join is a narrow
    * broadcast range probe, not a shuffle. */
  def q207PpsSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"source").orderBy($"doc_id")
    val docs = Tables.documents(s, dir)
      .select($"source", $"doc_id", $"n_chars")
      .withColumn("cum_hi", sum($"n_chars").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("cum_lo", $"cum_hi" - $"n_chars")
      .withColumn("total", sum($"n_chars").over(
        Window.partitionBy($"source")))
    val js = s.range(0, 5).select($"id".cast("int").as("j"))
    docs.join(broadcast(js),
        expr("cum_lo <= ((2 * j + 1) * total) div 10") &&
        expr("((2 * j + 1) * total) div 10 < cum_hi"))
      .select($"source", $"j", $"doc_id", $"n_chars")
      .orderBy($"source", $"j")
  }

  val q207Sql: String =
    """WITH d AS (
      |  SELECT source, doc_id, n_chars,
      |    CAST(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_hi,
      |    CAST(sum(n_chars) OVER (PARTITION BY source) AS BIGINT) AS total
      |  FROM documents),
      |d2 AS (SELECT *, cum_hi - n_chars AS cum_lo FROM d)
      |SELECT source, j, doc_id, n_chars
      |FROM d2 JOIN (SELECT unnest(generate_series(0, 4)) AS j) t
      |  ON cum_lo <= ((2 * j + 1) * total) // 10
      | AND ((2 * j + 1) * total) // 10 < cum_hi
      |ORDER BY source, j""".stripMargin

  /** q208: largest-remainder APPORTIONMENT — allocate a 1000-document
    * sampling budget across sources proportionally to their document
    * counts with Hamilton's method: integer floor shares first, then
    * the leftover seats go to the largest fractional remainders (ties
    * by source name — in the query text). The exact-integer answer to
    * "how many from each stratum" that naive rounding gets wrong (sums
    * drift off the budget); same algorithm as parliamentary seat
    * allocation. Remainder comparison is done on exact integers
    * (`N_h·B mod N`), never on floating quotas. */
  def q208Apportionment(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val budget = 1000L
    val counts = Tables.documents(s, dir)
      .groupBy($"source").agg(count(lit(1)).as("n"))
    val total = counts.agg(sum($"n").as("total"))
    val base = counts.crossJoin(broadcast(total))
      .withColumn("floor_share", expr(s"(n * ${budget}L) div total"))
      .withColumn("rem", expr(s"(n * ${budget}L) % total"))
    val leftover = base.agg((lit(budget) - sum($"floor_share")).as("k"))
    base.crossJoin(broadcast(leftover))
      .withColumn("rrank", row_number().over(
        Window.orderBy($"rem".desc, $"source".asc)))
      .withColumn("alloc",
        $"floor_share" + when($"rrank" <= $"k", 1L).otherwise(0L))
      .select($"source", $"n", $"floor_share", $"rrank".cast("int").as("rrank"),
        $"alloc")
      .orderBy($"source")
  }

  val q208Sql: String =
    """WITH c AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM c),
      |b AS (
      |  SELECT source, n,
      |    CAST((n * 1000) // total AS BIGINT) AS floor_share,
      |    CAST((n * 1000) % total AS BIGINT) AS rem
      |  FROM c, t),
      |k AS (SELECT CAST(1000 - sum(floor_share) AS BIGINT) AS k FROM b)
      |SELECT source, n, floor_share,
      |  CAST(rrank AS INT) AS rrank,
      |  CAST(floor_share + CASE WHEN rrank <= k.k THEN 1 ELSE 0 END AS BIGINT) AS alloc
      |FROM (SELECT b.*, row_number() OVER (ORDER BY rem DESC, source ASC) AS rrank
      |      FROM b) b, k
      |ORDER BY source""".stripMargin

  /** q226: NEYMAN ALLOCATION — the optimal-variance member of the
    * survey-sampling family (q85 systematic, q207 PPS, q208
    * proportional Hamilton): a sample budget split across strata
    * ∝ N_h·σ_h, so high-variance strata buy proportionally more
    * samples (the allocation minimizing estimator variance at fixed
    * budget). Hash-exact despite the σ: N_h·σ_h = √(N_h·Σx² − (Σx)²)
    * over CENT-scaled integers — the radicand is exact BIGINT (q194's
    * second-moment discipline) and IEEE-754 sqrt of an exact integer
    * is correctly rounded on both engines (q203's precedent), so the
    * rounded weight is a deterministic BIGINT and the largest-remainder
    * split runs on integers end-to-end (q208's machinery, ties to the
    * lexicographically first stratum).
    *
    * Headroom (q194's note): cents ≤ ~5.6×10⁴ here, so Long holds the
    * radicand to ~5×10⁴ rows per stratum — sf0.1's ~2×10⁴ is inside;
    * a bigger corpus moves the radicand to DECIMAL(38) unchanged
    * (and then must pin the decimal→double conversion before sqrt). */
  def q226NeymanAllocation(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val budget = 10000L
    val st = graft.Tables.events(s, dir)
      .select($"event_type", round($"value" * 100, 0).cast("long").as("xc"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"xc").as("sx"),
        sum($"xc" * $"xc").as("sx2"))
      .withColumn("w",
        round(sqrt(($"n" * $"sx2" - $"sx" * $"sx").cast("double")), 0)
          .cast("long"))
    val totals = st.agg(sum($"w").as("tw"))
    val base = st.crossJoin(broadcast(totals))
      .withColumn("floor_share", expr(s"(w * ${budget}L) div tw"))
      .withColumn("rem", expr(s"(w * ${budget}L) % tw"))
    val leftover = base.agg((lit(budget) - sum($"floor_share")).as("k"))
    base.crossJoin(broadcast(leftover))
      .withColumn("rrank", row_number().over(
        Window.orderBy($"rem".desc, $"event_type".asc)))
      .withColumn("alloc", $"floor_share" + when($"rrank" <= $"k", 1L).otherwise(0L))
      .select($"event_type", $"n", $"w", $"alloc")
      .orderBy($"event_type")
  }

  val q226Sql: String =
    """WITH e AS (
      |  SELECT event_type, CAST(round(value * 100, 0) AS BIGINT) AS xc
      |  FROM events),
      |st AS (
      |  SELECT event_type, count(*) AS n, CAST(sum(xc) AS BIGINT) AS sx,
      |         CAST(sum(xc * xc) AS BIGINT) AS sx2
      |  FROM e GROUP BY event_type),
      |w AS (
      |  SELECT event_type, n,
      |    CAST(round(sqrt(CAST(n * sx2 - sx * sx AS DOUBLE)), 0) AS BIGINT) AS w
      |  FROM st),
      |t AS (SELECT CAST(sum(w) AS BIGINT) AS tw FROM w),
      |b AS (
      |  SELECT event_type, n, w,
      |    CAST((w * 10000) // tw AS BIGINT) AS floor_share,
      |    CAST((w * 10000) % tw AS BIGINT) AS rem
      |  FROM w, t),
      |k AS (SELECT CAST(10000 - sum(floor_share) AS BIGINT) AS k FROM b)
      |SELECT event_type, n, w,
      |  CAST(floor_share + CASE WHEN rrank <= k.k THEN 1 ELSE 0 END AS BIGINT) AS alloc
      |FROM (SELECT b.*, row_number() OVER (ORDER BY rem DESC, event_type ASC) AS rrank
      |      FROM b) b, k
      |ORDER BY event_type""".stripMargin

  /** q213: q197's PRODUCTION form, registered and graded — equi-depth
    * histogram from approx_percentile boundaries instead of a global
    * ntile. The 9 inner decile boundaries come from ONE aggregation of
    * mergeable Greenwald-Khanna sketches (map-side partials, no total
    * order anywhere); rows are assigned to buckets by counting
    * boundaries below them (a 9-value broadcast evaluated map-side);
    * the per-bucket census is an ordinary hash aggregation — every
    * stage survives a 1000-executor 100 TB scan, which is exactly what
    * q197's single-partition ntile does not.
    *
    * Sketch boundaries are engine-specific bits, so the graded columns
    * follow the q139/q54 discipline: bucket id, the EXACT total row
    * count, and each engine's own accuracy boolean — did its sketch
    * put within 5% of N/10 rows in the bucket (the equi-depth semantic
    * contract), its own boundaries judged against its own counts. */
  def q213EquidepthSketch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val o = Tables.orders(s, dir).select($"o_totalprice")
    val b = o.agg(
      expr("approx_percentile(o_totalprice, " +
        "array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D), 10000)").as("bs"),
      count(lit(1)).as("n_total"))
    o.crossJoin(broadcast(b))
      .withColumn("decile",
        expr("1 + aggregate(bs, 0, (acc, x) -> " +
          "acc + (CASE WHEN o_totalprice > x THEN 1 ELSE 0 END))"))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_bucket"), first($"n_total").as("n_total"))
      .select($"decile", $"n_total",
        (abs($"n_bucket" - $"n_total" / lit(10.0)) <= $"n_total" * lit(0.05))
          .as("depth_ok"))
      .orderBy($"decile")
  }

  val q213Sql: String =
    """WITH b AS (
      |  SELECT approx_quantile(o_totalprice,
      |           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs,
      |         count(*) AS n_total
      |  FROM orders),
      |a AS (
      |  SELECT CAST(1 + len(list_filter(b.bs, x -> o.o_totalprice > x)) AS INT)
      |           AS decile,
      |         b.n_total
      |  FROM orders o CROSS JOIN b)
      |SELECT decile, any_value(n_total) AS n_total,
      |       abs(count(*) - any_value(n_total) / 10.0)
      |         <= any_value(n_total) * 0.05 AS depth_ok
      |FROM a GROUP BY decile ORDER BY decile""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q226_neyman_allocation" -> (q226NeymanAllocation _),
    "q213_equidepth_sketch" -> (q213EquidepthSketch _),
    "q207_pps_sample"   -> (q207PpsSample _),
    "q208_apportionment" -> (q208Apportionment _),
    "q196_snapshot_diff" -> (q196SnapshotDiff _),
    "q197_equidepth_hist" -> (q197EquidepthHist _),
    "q191_relational_division" -> (q191RelationalDivision _),
    "q192_ignore_nulls" -> (q192IgnoreNulls _),
    "q178_listagg"      -> (q178Listagg _),
    "q81_value_windows" -> (q81ValueWindows _),
    "q154_cdc_apply"    -> (q154CdcApply _),
    "q164_date_spine"   -> (q164DateSpine _),
    "q167_trend_slope"  -> (q167TrendSlope _),
    "q168_nullsafe_join" -> (q168NullSafeJoin _),
    "q145_scd2_intervals" -> (q145Scd2Intervals _),
    "q146_skew_report"  -> (q146SkewReport _),
    "q149_pit_lookup"   -> (q149PitLookup _),
    "q82_string_suite"  -> (q82StringSuite _),
    "q83_histogram"     -> (q83Histogram _),
    "q84_time_bucket"   -> (q84TimeBucket _),
    "q85_sampling"      -> (q85Sampling _),
    "q120_unpivot"      -> (q120Unpivot _),
  )

  val oracle: Map[String, String] = Map(
    "q226_neyman_allocation" -> q226Sql,
    "q213_equidepth_sketch" -> q213Sql,
    "q207_pps_sample"   -> q207Sql,
    "q208_apportionment" -> q208Sql,
    "q196_snapshot_diff" -> q196Sql,
    "q197_equidepth_hist" -> q197Sql,
    "q191_relational_division" -> q191Sql,
    "q192_ignore_nulls" -> q192Sql,
    "q178_listagg"      -> q178Sql,
    "q81_value_windows" -> q81Sql,
    "q154_cdc_apply"    -> q154Sql,
    "q164_date_spine"   -> q164Sql,
    "q167_trend_slope"  -> q167Sql,
    "q168_nullsafe_join" -> q168Sql,
    "q145_scd2_intervals" -> q145Sql,
    "q146_skew_report"  -> q146Sql,
    "q149_pit_lookup"   -> q149Sql,
    "q82_string_suite"  -> q82Sql,
    "q83_histogram"     -> q83Sql,
    "q84_time_bucket"   -> q84Sql,
    "q85_sampling"      -> q85Sql,
    "q120_unpivot"      -> q120Sql,
  )
}
