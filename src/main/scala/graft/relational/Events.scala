package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Event-stream operators in their batch formulation, mirroring the
  * reference's monitoring surface (SURVEY.md §2.1 S13–S19, S24):
  * status upsert→latest-event dedup, stall detection on event-time
  * staleness, pulse rollup, ETA estimation, plus windowing semantics
  * (tumbling + session) that `graft.streaming` re-implements as true
  * Structured Streaming queries over the same data.
  *
  * All oracle SQL casts `events.ts` (TIMESTAMP_NS in DuckDB) to µs
  * TIMESTAMP to match Spark's read (see Tables.events).
  */
object Events {

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  private val evCte =
    "WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value, props FROM events)"

  /** q22: tumbling window aggregation (pulse rollup cadence S16 — ref
    * `agents/orbiter.md:158-242`): per-hour × event-type counts. In
    * streaming form this is `groupBy(window($"ts","1 hour"), …)`. */
  def q22Tumbling(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ev(s, dir)
      .groupBy(date_trunc("hour", $"ts").as("hour"), $"event_type")
      .agg(count(lit(1)).as("n"), round(dsum($"value"), 2).as("total_value"))
      .orderBy($"hour", $"event_type")
  }

  val q22Sql: String =
    s"""$evCte
       |SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
       |       count(*) AS n, round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_value
       |FROM ev GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin

  /** q23: session windows — 30-minute-gap sessionization per user
    * (streaming `session_window(ts, "30 minutes")` semantics, batch
    * lag+cumsum formulation). */
  def q23Sessions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    ev(s, dir)
      .withColumn("prev_ts", lag($"ts", 1).over(wOrd))
      .withColumn("new_sess",
        when($"prev_ts".isNull ||
          unix_micros($"ts".cast("timestamp")) - unix_micros($"prev_ts".cast("timestamp")) > 30L * 60 * 1000000, 1)
          .otherwise(0))
      .withColumn("sess_id", sum($"new_sess")
        .over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"sess_id")
      .agg(count(lit(1)).as("n_events"),
        min($"ts").as("sess_start"),
        max($"ts").as("sess_end"))
      .orderBy($"user_id", $"sess_id")
  }

  val q23Sql: String =
    s"""$evCte,
       |flagged AS (
       |  SELECT user_id, event_id, ts,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
       |  FROM ev
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT user_id, ts,
       |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
       |  FROM flagged)
       |SELECT user_id, sess_id, count(*) AS n_events,
       |       min(ts) AS sess_start, max(ts) AS sess_end
       |FROM sess GROUP BY user_id, sess_id
       |ORDER BY user_id, sess_id""".stripMargin

  /** q24: first-event dedup — streaming `dropDuplicates` within watermark
    * (claim CAS S12: first writer wins — ref `hooks/session-start.sh:60-67`):
    * earliest event per (user, type). */
  def q24DedupFirst(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id", $"event_type")
      .orderBy($"ts".asc, $"event_id".asc)
    ev(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_type", $"event_id", $"ts")
      .orderBy($"user_id", $"event_type")
  }

  val q24Sql: String =
    s"""$evCte
       |SELECT user_id, event_type, event_id, ts FROM (
       |  SELECT user_id, event_type, event_id, ts,
       |    row_number() OVER (PARTITION BY user_id, event_type
       |                       ORDER BY ts ASC, event_id ASC) AS rn
       |  FROM ev) t
       |WHERE rn = 1 ORDER BY user_id, event_type""".stripMargin

  /** q25: stall detection S15 (ref `agents/orbiter.md:176-194`): a user is
    * stalled if their latest event is >10 minutes older than the stream's
    * high-water mark — watermark staleness in batch form. */
  def q25StallDetect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir)
    val hwm = e.agg(max($"ts").as("hwm"))
    e.groupBy($"user_id").agg(max($"ts").as("last_ts"), count(lit(1)).as("n_events"))
      .crossJoin(broadcast(hwm))
      .withColumn("stale_min",
        floor((unix_micros($"hwm".cast("timestamp")) - unix_micros($"last_ts".cast("timestamp"))) / 60000000L))
      .withColumn("stalled", $"stale_min" >= 10)
      .select($"user_id", $"last_ts", $"n_events", $"stale_min", $"stalled")
      .orderBy($"user_id")
  }

  val q25Sql: String =
    s"""$evCte
       |SELECT user_id, last_ts, n_events, stale_min, stale_min >= 10 AS stalled
       |FROM (
       |  SELECT user_id, max(ts) AS last_ts, count(*) AS n_events,
       |    CAST(floor(date_diff('microseconds', max(ts), (SELECT max(ts) FROM ev)) / 60000000.0) AS BIGINT) AS stale_min
       |  FROM ev GROUP BY user_id) t
       |ORDER BY user_id""".stripMargin

  /** q26: JSON field extraction S24 (ref `agents/output-processor.md:35-61`,
    * jq access everywhere): pull `props.k`, aggregate per type. */
  def q26JsonProps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ev(s, dir)
      .withColumn("k", get_json_object($"props", "$.k").cast("int"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        round(avg($"k"), 2).as("avg_k"),
        max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  val q26Sql: String =
    """SELECT event_type, count(*) AS n,
      |  round(avg(CAST(json_extract_string(props, '$.k') AS INT)), 2) AS avg_k,
      |  CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q27: ETA estimation S19 (ref `commands/pulsar-status.md:87`): average
    * inter-event gap per user from ordered history — "estimated remaining
    * ≈ completed-phase timing" generalized. */
  def q27EtaGaps(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    ev(s, dir)
      .withColumn("gap_us",
        unix_micros($"ts".cast("timestamp")) - unix_micros(lag($"ts", 1).over(w).cast("timestamp")))
      .groupBy($"user_id")
      .agg(round(sum($"gap_us") / count($"gap_us") / 1000000.0, 2).as("avg_gap_sec"),
        count($"gap_us").as("n_gaps"))
      .orderBy($"user_id")
  }

  val q27Sql: String =
    s"""$evCte
       |SELECT user_id,
       |  round(sum(gap_us) / count(gap_us) / 1000000.0, 2) AS avg_gap_sec,
       |  count(gap_us) AS n_gaps
       |FROM (
       |  SELECT user_id,
       |    date_diff('microseconds', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) AS gap_us
       |  FROM ev) t
       |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q28: pulse rollup S16 (ref `agents/orbiter.md:198-242`): the
    * per-round/per-plan aggregate restated — per event type: volume,
    * distinct actors, first/last activity. */
  def q28PulseRollup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ev(s, dir)
      .groupBy($"event_type")
      .agg(
        count(lit(1)).as("n"),
        countDistinct($"user_id").as("n_users"),
        min($"ts").as("first_ts"),
        max($"ts").as("last_ts"),
        round(dsum($"value"), 2).as("total_value"))
      .orderBy($"event_type")
  }

  val q28Sql: String =
    s"""$evCte
       |SELECT event_type, count(*) AS n, count(DISTINCT user_id) AS n_users,
       |       min(ts) AS first_ts, max(ts) AS last_ts,
       |       round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_value
       |FROM ev GROUP BY event_type ORDER BY event_type""".stripMargin

  /** q141: cohort retention — the standard product-analytics readout
    * and, for a training-data engine, the shape of "how much of week
    * W's crawl is still active k weeks later". Users cohort by the ISO
    * week of their FIRST event (date_trunc('week') is Monday-anchored
    * in both engines); for every (cohort, k) the retained distinct
    * users and the retained fraction of the cohort. k is exact integer
    * arithmetic (day difference of two week-truncations is a multiple
    * of 7 by construction).
    *
    * Scale shape: two keyed aggregations over the event stream (first
    * event per user; distinct user-weeks) and one broadcast-size join
    * on the cohort dimension — no self-join, no window over the full
    * stream. */
  def q141CohortRetention(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wk = ev(s, dir).select($"user_id", date_trunc("week", $"ts").as("w"))
    val firsts = wk.groupBy($"user_id").agg(min($"w").as("cw"))
    val active = wk.distinct()
    val perK = active.join(firsts, "user_id")
      .withColumn("k", (datediff($"w", $"cw") / 7).cast("int"))
      .groupBy($"cw", $"k").agg(countDistinct($"user_id").as("n_users"))
    val cohorts = firsts.groupBy($"cw").agg(countDistinct($"user_id").as("cohort_n"))
    perK.join(cohorts, "cw")
      .withColumn("retention", round($"n_users" / $"cohort_n", 4))
      .select($"cw".cast("date").as("cohort_week"), $"k", $"n_users", $"retention")
      .orderBy($"cohort_week", $"k")
  }

  val q141Sql: String =
    s"""$evCte,
       |wk AS (SELECT user_id, date_trunc('week', ts) AS w FROM ev),
       |firsts AS (SELECT user_id, min(w) AS cw FROM wk GROUP BY user_id),
       |active AS (SELECT DISTINCT user_id, w FROM wk),
       |perk AS (
       |  SELECT f.cw, CAST(date_diff('day', f.cw, a.w) / 7 AS INT) AS k,
       |    count(DISTINCT a.user_id) AS n_users
       |  FROM active a JOIN firsts f ON a.user_id = f.user_id
       |  GROUP BY 1, 2),
       |cohorts AS (SELECT cw, count(DISTINCT user_id) AS cohort_n
       |            FROM firsts GROUP BY cw)
       |SELECT CAST(p.cw AS DATE) AS cohort_week, p.k, p.n_users,
       |  round(p.n_users / c.cohort_n, 4) AS retention
       |FROM perk p JOIN cohorts c ON p.cw = c.cw
       |ORDER BY cohort_week, k""".stripMargin

  /** q142: staged conversion funnel — view → click → purchase with
    * STRICTLY INCREASING timestamps per user (a later stage only
    * counts if it happens after the user's earliest qualifying
    * previous stage), segmented by market segment. The ordered-
    * sequence constraint is what separates a funnel from three
    * filters; each stage is one keyed min-aggregation over the
    * events that survive the previous stage's timestamp — no window
    * over the full stream, no self-join explosion.
    *
    * Users outside the customer dimension do not funnel (inner join —
    * defined and graded). Rates are round(stage_n / prev_n, 4), with
    * the zero-denominator guard explicit on both sides. */
  def q142EventFunnel(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir).select($"user_id", $"event_type", $"ts")
    val v = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("t1"))
    val c = e.filter($"event_type" === "click").join(v, "user_id")
      .filter($"ts" > $"t1")
      .groupBy($"user_id").agg(min($"ts").as("t2"))
    val p = e.filter($"event_type" === "purchase").join(c, "user_id")
      .filter($"ts" > $"t2")
      .groupBy($"user_id").agg(min($"ts").as("t3"))
    v.join(Tables.customer(s, dir).select($"c_custkey", $"c_mktsegment"),
        $"user_id" === $"c_custkey")
      .join(c.select($"user_id".as("u2")), $"user_id" === $"u2", "left")
      .join(p.select($"user_id".as("u3")), $"user_id" === $"u3", "left")
      .groupBy($"c_mktsegment")
      .agg(
        count(lit(1)).as("n_view"),
        sum(when($"u2".isNotNull, 1L).otherwise(0L)).as("n_click"),
        sum(when($"u3".isNotNull, 1L).otherwise(0L)).as("n_purchase"))
      .withColumn("r_click", round($"n_click" / $"n_view", 4))
      .withColumn("r_purchase",
        round(when($"n_click" > 0, $"n_purchase" / $"n_click").otherwise(0.0), 4))
      .orderBy($"c_mktsegment")
  }

  val q142Sql: String =
    s"""$evCte,
       |v AS (SELECT user_id, min(ts) AS t1 FROM ev
       |      WHERE event_type = 'view' GROUP BY user_id),
       |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM ev e JOIN v ON e.user_id = v.user_id
       |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
       |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM ev e JOIN c ON e.user_id = c.user_id
       |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
       |SELECT cu.c_mktsegment, count(*) AS n_view,
       |  CAST(sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       |  CAST(sum(CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       |  round(CAST(sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |        / count(*), 4) AS r_click,
       |  round(CASE WHEN sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END) > 0
       |    THEN CAST(sum(CASE WHEN p.user_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
       |      / sum(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
       |    ELSE 0.0 END, 4) AS r_purchase
       |FROM v JOIN customer cu ON v.user_id = cu.c_custkey
       |LEFT JOIN c ON v.user_id = c.user_id
       |LEFT JOIN p ON v.user_id = p.user_id
       |GROUP BY cu.c_mktsegment ORDER BY cu.c_mktsegment""".stripMargin

  /** q144: sliding-window spike detection — per event type, each
    * hourly bucket against its trailing 24 HOURS (a true RANGE frame
    * over epoch seconds, not "last 24 observed rows": gap hours
    * shrink the window's population, and the n24 column reports it).
    * The spike predicate is pure integer arithmetic — `n·n24 > 2·Σ`
    * ⟺ "count exceeds 2× the trailing mean" — so the flag cannot be
    * flipped by a floating rounding difference between engines; the
    * warm-up guard (n24 ≥ 12) keeps half-empty windows from flagging.
    *
    * Scale shape: one keyed aggregation to hourly buckets (the only
    * shuffle — output is |types|×|hours|, tiny regardless of input
    * scale), then one partitioned range-frame window over it. */
  def q144SpikeDetect(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val hourly = ev(s, dir)
      .groupBy($"event_type", date_trunc("hour", $"ts").as("hour"))
      .agg(count(lit(1)).as("n"))
      .withColumn("he", unix_timestamp($"hour".cast("timestamp")))
    val w = Window.partitionBy($"event_type").orderBy($"he")
      .rangeBetween(-82800, 0)
    hourly
      .withColumn("s24", sum($"n").over(w))
      .withColumn("n24", count(lit(1)).over(w))
      .withColumn("spike", $"n24" >= 12 && $"n" * $"n24" > $"s24" * 2)
      .select($"event_type", $"hour".cast("timestamp").as("hour"),
        $"n", $"s24", $"n24", $"spike")
      .orderBy($"event_type", $"hour")
  }

  val q144Sql: String =
    s"""$evCte,
       |hourly AS (
       |  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
       |  FROM ev GROUP BY 1, 2),
       |he AS (SELECT *, CAST(epoch(hour) AS BIGINT) AS he FROM hourly)
       |SELECT event_type, hour, n,
       |  CAST(sum(n) OVER w AS BIGINT) AS s24,
       |  count(*) OVER w AS n24,
       |  (count(*) OVER w >= 12 AND n * count(*) OVER w > sum(n) OVER w * 2) AS spike
       |FROM he
       |WINDOW w AS (PARTITION BY event_type ORDER BY he
       |             RANGE BETWEEN 82800 PRECEDING AND CURRENT ROW)
       |ORDER BY event_type, hour""".stripMargin

  /** q153: HOPPING (sliding) window aggregation — the third window kind
    * next to tumbling (q22/q84) and session (q23): 2-hour windows
    * sliding every 30 minutes, so each event contributes to exactly 4
    * overlapping windows (the smoothing cadence of a monitoring pulse
    * that must not jump at bucket edges — streaming form:
    * `groupBy(window($"ts","2 hours","30 minutes"))`). Spark's `window`
    * with a slide expands each row to its duration/slide windows
    * BEFORE the aggregation — the fan-out is a narrow Expand (no extra
    * shuffle; one hash aggregation over 4× the rows), which is the
    * right 100 TB shape: cost scales with the overlap factor, never
    * with window count. The oracle restates the expansion explicitly:
    * window starts are the 30-minute `time_bucket` minus k slides,
    * k ∈ 0..3 (same epoch alignment q84 pins for tumbling buckets). */
  def q153HoppingWindow(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ev(s, dir)
      .groupBy(window($"ts", "2 hours", "30 minutes"), $"event_type")
      .agg(count(lit(1)).as("n"), round(dsum($"value"), 2).as("total_value"))
      .select($"window.start".as("win_start"), $"event_type", $"n", $"total_value")
      .orderBy($"win_start", $"event_type")
  }

  val q153Sql: String =
    s"""$evCte,
       |w AS (
       |  SELECT event_type, value,
       |    time_bucket(INTERVAL 30 MINUTE, ts) - k * (INTERVAL 30 MINUTE) AS win_start
       |  FROM ev, unnest(generate_series(0, 3)) AS u(k))
       |SELECT CAST(win_start AS TIMESTAMP) AS win_start, event_type,
       |  count(*) AS n,
       |  round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS total_value
       |FROM w GROUP BY 1, 2 ORDER BY win_start, event_type""".stripMargin

  /** q162: session PATH mining — the product-analytics sequel to q23's
    * sessionization: each user session becomes an ordered event-type
    * path, paths decompose into their 3-step sub-paths (trigrams), and
    * the output ranks the 20 most common navigation patterns by the
    * number of SESSIONS containing them (distinct-per-session, so one
    * looping session cannot dominate the ranking).
    *
    * Determinism: session assembly orders by (ts, event_id) — a total
    * order — in both engines; trigram extraction reuses the dedup
    * family's shingle builder; ranking ties break by path text.
    * Scale: sessionization is a per-user window (the q23 shuffle), the
    * path aggregation rides the same partitioning, and the trigram
    * count is one hash aggregation over |sessions|·|path|-ish rows —
    * nothing pairwise anywhere. */
  def q162PathMining(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val paths = ev(s, dir)
      .withColumn("prev_ts", lag($"ts", 1).over(wOrd))
      .withColumn("new_sess",
        when($"prev_ts".isNull ||
          unix_micros($"ts".cast("timestamp")) - unix_micros($"prev_ts".cast("timestamp")) > 30L * 60 * 1000000, 1)
          .otherwise(0))
      .withColumn("sess_id", sum($"new_sess")
        .over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"sess_id")
      .agg(array_sort(collect_list(struct($"ts", $"event_id", $"event_type"))).as("evs"))
      .select(transform($"evs", e => e.getField("event_type")).as("steps"))
      .filter(size($"steps") >= 3)
    paths
      .select(explode(graft.llm.Dedup.shingles($"steps", 3)).as("trigram"))
      .groupBy($"trigram").agg(count(lit(1)).as("n_sessions"))
      .withColumn("rk", row_number().over(
        Window.orderBy($"n_sessions".desc, $"trigram".asc)))
      .filter($"rk" <= 20)
      .select($"rk", $"trigram", $"n_sessions")
      .orderBy($"rk")
  }

  val q162Sql: String =
    s"""$evCte,
       |flagged AS (
       |  SELECT user_id, event_id, ts, event_type,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
       |  FROM ev
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT user_id, event_id, ts, event_type,
       |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
       |  FROM flagged),
       |paths AS (
       |  SELECT list(event_type ORDER BY ts, event_id) AS steps
       |  FROM sess GROUP BY user_id, sess_id
       |  HAVING count(*) >= 3),
       |tri AS (
       |  SELECT unnest(list_distinct([
       |    concat_ws(' ', steps[i], steps[i+1], steps[i+2])
       |    FOR i IN generate_series(1, len(steps) - 2)])) AS trigram
       |  FROM paths),
       |c AS (SELECT trigram, count(*) AS n_sessions FROM tri GROUP BY trigram),
       |r AS (SELECT trigram, n_sessions,
       |        row_number() OVER (ORDER BY n_sessions DESC, trigram ASC) AS rk
       |      FROM c)
       |SELECT rk, trigram, n_sessions FROM r WHERE rk <= 20 ORDER BY rk""".stripMargin

  /** q169: per-window approximate distinct — the sketch family pushed
    * into the windowing surface: daily active users as BOTH the exact
    * count (hash-graded) and each engine's own HLL estimate asserted
    * within 10% of its own exact value (q54's bounded-accuracy
    * contract, per window). At 100 TB the exact per-window distinct
    * is a full (day, user) shuffle; the HLL partial is constant-size
    * per window and MERGEABLE — the only shape a streaming DAU
    * counter can hold in state — which is why the sketch column is
    * the one a production dashboard reads and the exact column is the
    * one the oracle can grade. */
  def q169WindowApproxDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ev(s, dir)
      .groupBy(date_trunc("day", $"ts").as("day"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("exact_users"),
        (abs(approx_count_distinct($"user_id") - countDistinct($"user_id")) <=
          countDistinct($"user_id") * 0.10).as("approx_ok"))
      .orderBy($"day")
  }

  val q169Sql: String =
    s"""$evCte
       |SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       |  count(*) AS n_events,
       |  count(DISTINCT user_id) AS exact_users,
       |  abs(approx_count_distinct(user_id) - count(DISTINCT user_id))
       |    <= count(DISTINCT user_id) * 0.10 AS approx_ok
       |FROM ev GROUP BY 1 ORDER BY day""".stripMargin

  /** q170: NATIVE session windows — q23's sessionization through
    * Spark's first-class `session_window` operator instead of the
    * manual lag+cumsum formulation (the same operator the streaming
    * engine uses for stateful session aggregation, so batch pipelines
    * written this way promote to `readStream` unchanged). Spark merges
    * overlapping [ts, ts+gap) intervals per key; a session's `end` is
    * therefore last event + gap, which the oracle restates as
    * max(ts) + INTERVAL 30 MINUTE over the lag+cumsum session — the
    * two formulations must agree row-for-row, which IS the grading:
    * the native operator against the relational definition. */
  def q170SessionNative(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ev(s, dir)
      .groupBy(session_window($"ts", "30 minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"))
      .select($"user_id",
        $"session_window.start".as("sess_start"),
        $"session_window.end".as("sess_end"),
        $"n_events")
      .orderBy($"user_id", $"sess_start")
  }

  val q170Sql: String =
    s"""$evCte,
       |flagged AS (
       |  SELECT user_id, event_id, ts,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
       |  FROM ev
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT user_id, ts,
       |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
       |  FROM flagged)
       |SELECT user_id, min(ts) AS sess_start,
       |       max(ts) + INTERVAL 30 MINUTE AS sess_end,
       |       count(*) AS n_events
       |FROM sess GROUP BY user_id, sess_id
       |ORDER BY user_id, sess_start""".stripMargin
  // Boundary semantics, MEASURED not assumed: Spark's session_window
  // MERGES a gap of exactly the window (a 10:00:00 event and a
  // 10:30:00 event share a session at gap 30 min) — i.e. the native
  // operator agrees with q23's manual `> 30 min` split convention,
  // and an `>=` oracle would be a latent mismatch this corpus cannot
  // expose (no exact-gap pairs at sf0.01). RelationalSpec pins the
  // exact-boundary merge and the strictly-greater split.

  /** q180: Markov transition matrix of event types within sessions —
    * the "what happens next" model product analytics fits over q162's
    * session paths: per ordered adjacent pair (src → dst), the
    * transition count and the row-normalized probability. Output is
    * |event_types|² rows no matter the input size.
    *
    * Determinism: counts are exact integers and the probability is ONE
    * double division of two exact integers (bit-identical in any IEEE
    * engine) rounded after — q167's arithmetic-class discipline.
    * Scale: sessionization is the q23 per-user window; adjacent pairs
    * come from one `zip_with` over each path (no self-join of the
    * event table against itself shifted — the tempting formulation
    * that shuffles the fact table twice); the rest aggregates
    * |transitions| rows down to a constant-size matrix. */
  def q180MarkovTransitions(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    val paths = ev(s, dir)
      .withColumn("prev_ts", lag($"ts", 1).over(wOrd))
      .withColumn("new_sess",
        when($"prev_ts".isNull ||
          unix_micros($"ts".cast("timestamp")) - unix_micros($"prev_ts".cast("timestamp")) > 30L * 60 * 1000000, 1)
          .otherwise(0))
      .withColumn("sess_id", sum($"new_sess")
        .over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"sess_id")
      .agg(array_sort(collect_list(struct($"ts", $"event_id", $"event_type"))).as("evs"))
      .select(transform($"evs", e => e.getField("event_type")).as("steps"))
      .filter(size($"steps") >= 2)
    val trans = paths.select(explode(
        zip_with(slice($"steps", lit(1), size($"steps") - 1),
          slice($"steps", lit(2), size($"steps") - 1),
          (a, b) => struct(a.as("src"), b.as("dst")))).as("t"))
      .select($"t.src".as("src"), $"t.dst".as("dst"))
    val counts = trans.groupBy($"src", $"dst").agg(count(lit(1)).as("n"))
    val totals = counts.groupBy($"src").agg(sum($"n").as("tot"))
    counts.join(totals, Seq("src"))
      .withColumn("prob", round($"n".cast("double") / $"tot", 6))
      .select($"src", $"dst", $"n", $"prob")
      .orderBy($"src", $"dst")
  }

  val q180Sql: String =
    s"""$evCte,
       |flagged AS (
       |  SELECT user_id, event_id, ts, event_type,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
       |  FROM ev
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT user_id, event_id, ts, event_type,
       |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
       |  FROM flagged),
       |paths AS (
       |  SELECT list(event_type ORDER BY ts, event_id) AS steps
       |  FROM sess GROUP BY user_id, sess_id
       |  HAVING count(*) >= 2),
       |idx AS (SELECT steps, unnest(generate_series(1, len(steps) - 1)) AS i
       |        FROM paths),
       |tr AS (SELECT steps[i] AS src, steps[i + 1] AS dst FROM idx),
       |c AS (SELECT src, dst, count(*) AS n FROM tr GROUP BY 1, 2),
       |t AS (SELECT src, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
       |SELECT c.src, c.dst, c.n, round(CAST(c.n AS DOUBLE) / t.tot, 6) AS prob
       |FROM c JOIN t USING (src) ORDER BY src, dst""".stripMargin

  /** q181: the VARIANT front door to semi-structured extraction —
    * q26's JSON aggregation re-expressed through Spark 4's first-class
    * `VariantType`: `parse_json` once, then typed `variant_get` paths.
    * At 100 TB this is not a style choice: a string column re-parses
    * its JSON in every expression that touches it, while a variant
    * column parses ONCE into a binary-encoded form that path
    * extraction reads without re-parsing (and that Parquet shredding
    * can push into the scan). Graded with q26's oracle verbatim — the
    * q130 twin-front-door pattern: two engines' two access paths, one
    * answer. */
  def q181VariantJson(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    ev(s, dir)
      .withColumn("v", parse_json($"props"))
      .withColumn("k", variant_get($"v", "$.k", "int"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        round(avg($"k"), 2).as("avg_k"),
        max($"k").as("max_k"))
      .orderBy($"event_type")
  }

  /** q184: time-weighted average value (TWAP) per event type per day —
    * the irregular-series average where each observation holds until
    * the next one (and the day's last holds to midnight), so a burst
    * of readings cannot dominate the way a row-count average lets it.
    * The quant/metering aggregate the plain avg family (q22) cannot
    * express.
    *
    * Exactness: durations are integer µs from `lead` (one per-key
    * window pass); each value is cast to DECIMAL before the
    * value×duration product, so numerator and denominator are exact
    * integers/decimals summed associatively; ONE division at the end,
    * rounded after (the dsum/q167 discipline — double sums would make
    * the last bits partition-order-dependent). */
  def q184Twap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"event_type", $"day").orderBy($"ts", $"event_id")
    ev(s, dir)
      .withColumn("day", date_trunc("day", $"ts"))
      .withColumn("tu", unix_micros($"ts".cast("timestamp")))
      .withColumn("next_tu", lead($"tu", 1).over(w))
      .withColumn("day_end",
        unix_micros(($"day" + expr("INTERVAL 1 DAY")).cast("timestamp")))
      .withColumn("dur", coalesce($"next_tu", $"day_end") - $"tu")
      .groupBy($"event_type", $"day")
      .agg(count(lit(1)).as("n"),
        sum($"dur").as("span_us"),
        // both sums are exact (decimal / bigint); cast each to double
        // BEFORE the division — decimal-division result scales differ
        // between engines and would round differently, while
        // exact-value→double casts and one IEEE divide are identical
        round(sum($"value".cast("decimal(18,4)") * $"dur").cast("double") /
          sum($"dur").cast("double"), 4).as("twap"))
      .orderBy($"event_type", $"day")
  }

  val q184Sql: String =
    s"""$evCte,
       |d AS (
       |  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       |         event_id, ts, value, epoch_us(ts) AS tu
       |  FROM ev),
       |t AS (
       |  SELECT event_type, day, value, tu,
       |    coalesce(
       |      lead(tu) OVER (PARTITION BY event_type, day ORDER BY ts, event_id),
       |      epoch_us(day + INTERVAL 1 DAY)) - tu AS dur
       |  FROM d)
       |SELECT event_type, day, count(*) AS n,
       |  CAST(sum(dur) AS BIGINT) AS span_us,
       |  round(CAST(sum(CAST(value AS DECIMAL(18,4)) * dur) AS DOUBLE)
       |        / CAST(sum(dur) AS DOUBLE), 4) AS twap
       |FROM t GROUP BY event_type, day
       |ORDER BY event_type, day""".stripMargin

  /** q195: conversion LAG distribution — per first-view-day cohort, how
    * long users take from first view to first purchase: converted-user
    * counts plus the p50/p90 lag. Lags are integer µs (exact) and the
    * percentiles are percentile_disc — COPIES of real lags (q171's
    * discipline), so the whole row is hash-exact. The funnel family's
    * latency half: q142 counts who converts, this says how fast. */
  def q195ConversionLag(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir)
    val firstView = e.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("v_ts"))
    val firstPurchase = e.filter($"event_type" === "purchase")
      .groupBy($"user_id").agg(min($"ts").as("p_ts"))
    firstView.join(firstPurchase, Seq("user_id"))
      .filter($"p_ts" >= $"v_ts")
      .select($"user_id",
        date_trunc("day", $"v_ts").as("cohort_day"),
        (unix_micros($"p_ts".cast("timestamp")) -
         unix_micros($"v_ts".cast("timestamp"))).as("lag_us"))
      .groupBy($"cohort_day")
      .agg(count(lit(1)).as("n_converted"),
        // percentile_disc returns DOUBLE even for integral input; the
        // value is a COPY of an integer lag, so the cast is lossless
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY lag_us)")
          .cast("long").as("p50_lag_us"),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY lag_us)")
          .cast("long").as("p90_lag_us"))
      .orderBy($"cohort_day")
  }

  val q195Sql: String =
    s"""$evCte,
       |fv AS (SELECT user_id, min(ts) AS v_ts FROM ev
       |       WHERE event_type = 'view' GROUP BY user_id),
       |fp AS (SELECT user_id, min(ts) AS p_ts FROM ev
       |       WHERE event_type = 'purchase' GROUP BY user_id),
       |lags AS (
       |  SELECT CAST(date_trunc('day', v_ts) AS TIMESTAMP) AS cohort_day,
       |         epoch_us(p_ts) - epoch_us(v_ts) AS lag_us
       |  FROM fv JOIN fp USING (user_id)
       |  WHERE p_ts >= v_ts)
       |SELECT cohort_day, count(*) AS n_converted,
       |  quantile_disc(lag_us, 0.5) AS p50_lag_us,
       |  quantile_disc(lag_us, 0.9) AS p90_lag_us
       |FROM lags GROUP BY cohort_day ORDER BY cohort_day""".stripMargin

  /** q200: user GROWTH accounting — per day: events, active users,
    * NEW users (first ever seen that day), returning users, and the
    * cumulative distinct-user count — the new-vs-returning growth
    * report every product dashboard leads with. The cumulative curve
    * is exact WITHOUT a running distinct: a user is counted on
    * exactly their first-seen day, so `sum(new) OVER (ORDER BY day)`
    * IS the cumulative distinct — one keyed min + two aggregations +
    * a 30-row window, no growing state anywhere. */
  def q200UserGrowth(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir)
      .select($"user_id", date_trunc("day", $"ts").as("day"))
    val firstSeen = e.groupBy($"user_id").agg(min($"day").as("first_day"))
    val daily = e.groupBy($"day")
      .agg(count(lit(1)).as("n_events"),
        countDistinct($"user_id").as("active_users"))
    val news = firstSeen.groupBy($"first_day".as("day"))
      .agg(count(lit(1)).as("new_users"))
    daily.join(news, Seq("day"), "left")
      .withColumn("new_users", coalesce($"new_users", lit(0L)))
      .withColumn("returning_users", $"active_users" - $"new_users")
      .withColumn("cum_users", sum($"new_users")
        .over(Window.orderBy($"day").rowsBetween(Window.unboundedPreceding, 0)))
      .select($"day", $"n_events", $"active_users", $"new_users",
        $"returning_users", $"cum_users")
      .orderBy($"day")
  }

  val q200Sql: String =
    s"""$evCte,
       |e AS (SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day FROM ev),
       |fs AS (SELECT user_id, min(day) AS first_day FROM e GROUP BY user_id),
       |d AS (SELECT day, count(*) AS n_events,
       |        count(DISTINCT user_id) AS active_users
       |      FROM e GROUP BY day),
       |nu AS (SELECT first_day AS day, count(*) AS new_users
       |       FROM fs GROUP BY first_day)
       |SELECT d.day, d.n_events, d.active_users,
       |  CAST(coalesce(nu.new_users, 0) AS BIGINT) AS new_users,
       |  CAST(d.active_users - coalesce(nu.new_users, 0) AS BIGINT) AS returning_users,
       |  CAST(sum(coalesce(nu.new_users, 0)) OVER (ORDER BY d.day
       |       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
       |FROM d LEFT JOIN nu ON nu.day = d.day
       |ORDER BY d.day""".stripMargin

  /** q202: month-over-month growth — revenue per order priority by
    * month with the growth rate against the previous month: decimal
    * sums (dsum discipline), one lag window, ONE division rounded
    * after; first month NULL. The period-over-period reporting
    * primitive the windows family (q08 running, q81 value windows)
    * did not yet state. */
  def q202MomGrowth(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority").orderBy($"month")
    graft.Tables.orders(s, dir)
      .groupBy($"o_orderpriority",
        date_trunc("month", $"o_orderdate").as("month"))
      .agg(count(lit(1)).as("n_orders"),
        round(dsum($"o_totalprice"), 2).as("revenue"))
      .withColumn("prev_rev", lag($"revenue", 1).over(w))
      .withColumn("mom_growth",
        round(($"revenue" - $"prev_rev") / $"prev_rev", 4))
      .select($"o_orderpriority", $"month", $"n_orders", $"revenue", $"mom_growth")
      .orderBy($"o_orderpriority", $"month")
  }

  val q202Sql: String =
    """WITH m AS (
      |  SELECT o_orderpriority,
      |    CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
      |    count(*) AS n_orders,
      |    round(CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 2) AS revenue
      |  FROM orders GROUP BY 1, 2)
      |SELECT o_orderpriority, month, n_orders, revenue,
      |  round((revenue - lag(revenue) OVER w) / lag(revenue) OVER w, 4) AS mom_growth
      |FROM m
      |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY month)
      |ORDER BY o_orderpriority, month""".stripMargin

  /** q223: rolling distinct users via MERGEABLE HLL SKETCHES — the
    * mechanics q54 only names, now exercised as real state: one
    * Datasketches HLL per day (`hll_sketch_agg`, a map-side-combining
    * partial), then "distinct users to date" for every day as the
    * running UNION of the daily sketches (`hll_union_agg` over the
    * cumulative window — sketch merges, never row re-scans). At 100 TB
    * the daily sketches are a few KB each; the exact form re-scans the
    * whole history per day, the sketch form costs one pass plus ~days
    * constant-size merges — the only shape a daily dashboard can
    * afford.
    *
    * Graded with the q54/q139 own-sketch discipline: the exact
    * cumulative distinct is computed WITHOUT a running distinct
    * (first-seen-day running sum — q200's identity) and hash-compared;
    * each engine then asserts its own sketch estimate lands within 5%
    * of its own exact value. */
  def q223HllRollingDistinct(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val e = ev(s, dir).select($"user_id", to_date($"ts").as("day"))
    val daily = e.groupBy($"day")
      .agg(count(lit(1)).as("n_events"),
        expr("hll_sketch_agg(user_id)").as("sk"))
    val firsts = e.groupBy($"user_id").agg(min($"day").as("d0"))
    val news = firsts.groupBy($"d0".as("day")).agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy($"day").rowsBetween(Window.unboundedPreceding, 0)
    daily.join(news, Seq("day"), "left")
      .withColumn("exact_cum", sum(coalesce($"n_new", lit(0L))).over(w))
      .withColumn("est",
        expr("hll_sketch_estimate(hll_union_agg(sk) OVER (ORDER BY day " +
          "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))"))
      .select($"day", $"n_events", $"exact_cum",
        (abs($"est" - $"exact_cum") <= $"exact_cum" * 0.05).as("sketch_ok"))
      .orderBy($"day")
  }

  val q223Sql: String =
    """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
      |daily AS (SELECT day, count(*) AS n_events FROM e GROUP BY 1),
      |firsts AS (SELECT user_id, min(day) AS d0 FROM e GROUP BY 1),
      |news AS (SELECT d0 AS day, count(*) AS n_new FROM firsts GROUP BY 1),
      |cum AS (
      |  SELECT d.day, d.n_events,
      |    CAST(sum(coalesce(n.n_new, 0))
      |           OVER (ORDER BY d.day ROWS UNBOUNDED PRECEDING) AS BIGINT)
      |      AS exact_cum
      |  FROM daily d LEFT JOIN news n ON n.day = d.day)
      |SELECT c.day, c.n_events, c.exact_cum,
      |  abs((SELECT approx_count_distinct(user_id) FROM e WHERE e.day <= c.day)
      |      - c.exact_cum) <= c.exact_cum * 0.05 AS sketch_ok
      |FROM cum c ORDER BY c.day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q223_hll_rolling_distinct" -> (q223HllRollingDistinct _),
    "q180_markov_transitions" -> (q180MarkovTransitions _),
    "q181_variant_json"   -> (q181VariantJson _),
    "q184_twap"           -> (q184Twap _),
    "q195_conversion_lag" -> (q195ConversionLag _),
    "q200_user_growth"    -> (q200UserGrowth _),
    "q202_mom_growth"     -> (q202MomGrowth _),
    "q22_tumbling_window" -> (q22Tumbling _),
    "q153_hopping_window" -> (q153HoppingWindow _),
    "q162_path_mining"    -> (q162PathMining _),
    "q169_window_approx_distinct" -> (q169WindowApproxDistinct _),
    "q170_session_native" -> (q170SessionNative _),
    "q141_cohort_retention" -> (q141CohortRetention _),
    "q142_event_funnel"   -> (q142EventFunnel _),
    "q144_spike_detect"   -> (q144SpikeDetect _),
    "q23_session_window"  -> (q23Sessions _),
    "q24_dedup_first"     -> (q24DedupFirst _),
    "q25_stall_detect"    -> (q25StallDetect _),
    "q26_json_props"      -> (q26JsonProps _),
    "q27_eta_gaps"        -> (q27EtaGaps _),
    "q28_pulse_rollup"    -> (q28PulseRollup _),
  )

  val oracle: Map[String, String] = Map(
    "q223_hll_rolling_distinct" -> q223Sql,
    "q180_markov_transitions" -> q180Sql,
    // same output contract as q26 — one oracle grades both access paths
    "q181_variant_json"   -> q26Sql,
    "q184_twap"           -> q184Sql,
    "q195_conversion_lag" -> q195Sql,
    "q200_user_growth"    -> q200Sql,
    "q202_mom_growth"     -> q202Sql,
    "q22_tumbling_window" -> q22Sql,
    "q153_hopping_window" -> q153Sql,
    "q141_cohort_retention" -> q141Sql,
    "q142_event_funnel"   -> q142Sql,
    "q144_spike_detect"   -> q144Sql,
    "q162_path_mining"    -> q162Sql,
    "q169_window_approx_distinct" -> q169Sql,
    "q170_session_native" -> q170Sql,
    "q23_session_window"  -> q23Sql,
    "q24_dedup_first"     -> q24Sql,
    "q25_stall_detect"    -> q25Sql,
    "q26_json_props"      -> q26Sql,
    "q27_eta_gaps"        -> q27Sql,
    "q28_pulse_rollup"    -> q28Sql,
  )
}
