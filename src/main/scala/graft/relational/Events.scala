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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q22_tumbling_window" -> (q22Tumbling _),
    "q23_session_window"  -> (q23Sessions _),
    "q24_dedup_first"     -> (q24DedupFirst _),
    "q25_stall_detect"    -> (q25StallDetect _),
    "q26_json_props"      -> (q26JsonProps _),
    "q27_eta_gaps"        -> (q27EtaGaps _),
    "q28_pulse_rollup"    -> (q28PulseRollup _),
  )

  val oracle: Map[String, String] = Map(
    "q22_tumbling_window" -> q22Sql,
    "q23_session_window"  -> q23Sql,
    "q24_dedup_first"     -> q24Sql,
    "q25_stall_detect"    -> q25Sql,
    "q26_json_props"      -> q26Sql,
    "q27_eta_gaps"        -> q27Sql,
    "q28_pulse_rollup"    -> q28Sql,
  )
}
