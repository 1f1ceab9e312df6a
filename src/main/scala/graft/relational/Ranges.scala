package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Range joins — the interval cousin of the native as-of join
  * (`plans.AsOfJoin`): point-in-interval ("which intervals was this
  * event inside?") and interval-overlap ("which intervals intersect?").
  * The reference's monitoring surface asks both shapes of its activity
  * windows (stall windows, active-plan TTLs — `agents/orbiter.md`
  * pulse/stall cadence); a training-data pipeline asks them of session
  * boundaries and validity intervals.
  *
  * Spark has no native range join: the naive formulation
  * (`a.ts BETWEEN b.start AND b.end`) plans a BroadcastNestedLoopJoin —
  * O(|A|·|B|) comparisons, the first thing that dies at 100 TB. Both
  * operators here use BUCKET DECOMPOSITION instead: quantize time into
  * fixed-width buckets, explode each interval to the buckets it covers,
  * tag each point with its single bucket, and equi-join on the bucket —
  * Catalyst plans an ordinary shuffled hash/sort-merge join whose
  * candidate mass is (per-bucket density)², not |A|·|B|. The exact
  * range predicate then filters candidates, all inside whole-stage
  * codegen. This is the same plan shape Databricks' range-join hint
  * lowers to, built from public primitives (`sequence` + `explode`).
  *
  * Exactly-once accounting, no `distinct` pass:
  *  - a POINT lands in exactly one bucket, so a (point, interval) match
  *    is found exactly once — no dedup needed;
  *  - an interval PAIR is co-bucketed in every bucket both cover; the
  *    pair is emitted only from its ANCHOR bucket — the bucket of
  *    `greatest(start1, start2)`, which lies inside both intervals of
  *    any overlapping pair — so each pair surfaces exactly once and the
  *    dedup shuffle a `distinct` would cost never exists.
  *
  * Bucket width trades fan-out (long intervals explode to many rows)
  * against per-bucket density (wide buckets put unrelated rows in one
  * cell). Width here = the 30-minute session TTL, so a typical dilated
  * session covers ~2 buckets; at 100 TB the width is the production
  * dial, exactly like the LSH family's band geometry.
  */
object Ranges {

  /** 30-minute bucket width in microseconds (matches the session TTL). */
  val BucketUs: Long = 30L * 60 * 1000000

  private def ev(s: SparkSession, dir: String): DataFrame = Tables.events(s, dir)

  private val evCte =
    "WITH ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value FROM events)"

  /** Sessionized ACTIVITY WINDOWS with the gap-timeout dilation: a
    * session is "active" from its first event until 30 minutes after
    * its last (the point at which the 30-minute-gap rule would have
    * closed it) — the same TTL semantics as the reference's pulse
    * freshness window. Output: one row per (user_id, sess_id) with
    * half-open [w_start, w_end) plus epoch-µs copies (au, bu) and a
    * has_purchase flag. Per-user window + one aggregation — the q23
    * shuffle, nothing new at scale. */
  def activeWindows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val wOrd = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    // The sessionize window's shuffle is ~1.5 MB, so AQE coalesces it
    // to ONE task and the lag/session-sum/agg chain runs serial
    // (profiled: twin ~600 ms single-task stages). Pin the per-user
    // partitioning to the cluster width (REPARTITION_BY_NUM — exempt
    // from AQE coalescing, satisfies the window's distribution, so no
    // second exchange).
    ev(s, dir)
      .repartition(s.sparkContext.defaultParallelism, $"user_id")
      .withColumn("prev_ts", lag($"ts", 1).over(wOrd))
      .withColumn("new_sess",
        when($"prev_ts".isNull ||
          unix_micros($"ts".cast("timestamp")) - unix_micros($"prev_ts".cast("timestamp")) > 30L * 60 * 1000000, 1)
          .otherwise(0))
      .withColumn("sess_id", sum($"new_sess")
        .over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"sess_id")
      .agg(min($"ts").as("w_start"), max($"ts").as("last_ts"),
        max(when($"event_type" === "purchase", 1).otherwise(0)).as("has_purchase"))
      .withColumn("w_end", $"last_ts" + expr("INTERVAL 30 MINUTES"))
      // events.ts reads as TIMESTAMP_NTZ (the q164 lesson): cast before
      // unix_micros, which only accepts TIMESTAMP (session TZ is UTC)
      .withColumn("au", unix_micros($"w_start".cast("timestamp")))
      .withColumn("bu", unix_micros($"w_end".cast("timestamp")))
      .drop("last_ts")
  }

  /** Shared oracle CTE chain: q23's sessionization + the TTL dilation. */
  private val windowsCte =
    s"""$evCte,
       |flagged AS (
       |  SELECT user_id, event_id, ts, event_type, value,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
       |  FROM ev
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       |sess AS (
       |  SELECT user_id, ts, event_type,
       |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
       |  FROM flagged),
       |w AS (
       |  SELECT user_id, sess_id, min(ts) AS w_start,
       |         max(ts) + INTERVAL 30 MINUTE AS w_end,
       |         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS has_purchase
       |  FROM sess GROUP BY user_id, sess_id)""".stripMargin

  /** Integral bucket id of an epoch-µs column (SQL `div` — exact long
    * division, no double rounding in the key). */
  private def bucketOf(colName: String): Column =
    expr(s"$colName div ${BucketUs}L")

  /** Intervals exploded to every bucket their half-open [au, bu) span
    * covers — `(bu - 1) div W` so an end exactly on a boundary does not
    * claim the next bucket. */
  private def explodedBuckets(iv: DataFrame): DataFrame =
    iv.withColumn("bucket",
      explode(sequence(expr(s"au div ${BucketUs}L"),
        expr(s"(bu - 1) div ${BucketUs}L"))))

  /** q174: POINT-IN-INTERVAL range join — for every activity window,
    * how many OTHER users' error events fired while it was active (and
    * their total value): the "what was I exposed to while active"
    * query a monitoring surface runs per session. Left-outer
    * semantics: windows with zero matching errors stay in the output
    * with zeros.
    *
    * Shape: windows explode to ~2 buckets each, errors tag their one
    * bucket, equi-join on the bucket, exact [au, bu) predicate +
    * cross-user filter in the join condition, one aggregation, then a
    * left join back for the zero rows. No nested-loop join anywhere —
    * PlanHygieneSpec would flag one catalog-wide, and RangesSpec pins
    * this plan specifically. */
  def q174RangeJoin(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // Same CPU-dense-small-shuffle story as q175 (profiled: 1.3 s
    // single-task join stage after AQE coalesced a ~1.5 MB shuffle):
    // pin the bucket-join partitioning to the cluster width.
    val width = s.sparkContext.defaultParallelism
    // EAGER cut (r19): wins feeds the bucket side AND the left join
    // back for zero rows — un-cut, both subtrees re-ran the sessionize
    val wins = activeWindows(s, dir).localCheckpoint(true)
    val winsB = explodedBuckets(wins)
      .select($"user_id", $"sess_id", $"au", $"bu", $"bucket")
      .repartition(width, $"bucket")
    val errs = ev(s, dir).filter($"event_type" === "error")
      .select($"user_id".as("e_user"),
        unix_micros($"ts".cast("timestamp")).as("tu"), $"value")
      .withColumn("bucket", bucketOf("tu"))
      .repartition(width, $"bucket")
    val hits = winsB.join(errs,
        winsB("bucket") === errs("bucket") &&
        $"tu" >= $"au" && $"tu" < $"bu" &&
        $"e_user" =!= winsB("user_id"))
      .groupBy(winsB("user_id"), $"sess_id")
      .agg(count(lit(1)).as("n"), round(dsum($"value"), 2).as("v"))
    wins.join(hits, Seq("user_id", "sess_id"), "left")
      .select($"user_id", $"sess_id", $"w_start", $"w_end",
        coalesce($"n", lit(0L)).as("n_err"),
        coalesce($"v", lit(0.0)).as("err_value"))
      .orderBy($"user_id", $"sess_id")
  }

  /** Oracle: the same windows theta-joined directly (DuckDB plans its
    * native IEJoin for the range predicate — its first-class range
    * join against this engine's bucket decomposition). */
  val q174Sql: String =
    s"""$windowsCte,
       |err AS (
       |  SELECT user_id AS e_user, ts AS e_ts, value FROM ev
       |  WHERE event_type = 'error')
       |SELECT w.user_id, w.sess_id, w.w_start, w.w_end,
       |       count(e_ts) AS n_err,
       |       coalesce(round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2), 0.0) AS err_value
       |FROM w LEFT JOIN err
       |  ON e_ts >= w_start AND e_ts < w_end AND e_user <> w.user_id
       |GROUP BY w.user_id, w.sess_id, w.w_start, w.w_end
       |ORDER BY user_id, sess_id""".stripMargin

  /** q175: INTERVAL-OVERLAP range join — co-activity: for each
    * PURCHASE session, every other user whose activity window
    * overlapped it, ranked by total overlapping microseconds (top 20
    * user pairs). The "who was here at the same time" query of
    * co-visitation analysis, asked of time intervals instead of item
    * buckets.
    *
    * Exactly-once without `distinct`: both sides explode to buckets,
    * but a candidate pair is kept only in its ANCHOR bucket
    * (`greatest(au1, au2) div W`) — a bucket inside both intervals of
    * every truly-overlapping pair, and exactly one of the co-bucketed
    * copies. Overlap length is pure BIGINT µs arithmetic, so counts,
    * sums and the ranking are exact in both engines. */
  def q175IntervalOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // The bucket join's CPU is the per-bucket pair verification, not
    // its bytes: AQE sees a ~1.5 MB shuffle and coalesces the join to
    // ONE task (profiled: a 2.2 s single-task stage on a 32-core box
    // — guide §2.6's idle-capacity trap for CPU-dense small shuffles).
    // Pin the join-side partitioning to the cluster width explicitly
    // (REPARTITION_BY_NUM is exempt from AQE coalescing); the width is
    // defaultParallelism, so it scales with the cluster, and the join
    // key partitioning is exactly what the pair join needs — no extra
    // exchange downstream.
    val width = s.sparkContext.defaultParallelism
    // EAGER cut (r19): both exploded sides derive from wins — un-cut,
    // each side re-ran the sessionize chain (profiled as twin stages)
    val wins = activeWindows(s, dir).localCheckpoint(true)
    val buyers = explodedBuckets(wins.filter($"has_purchase" === 1))
      .select($"user_id".as("buyer_id"), $"au".as("p_au"), $"bu".as("p_bu"), $"bucket")
      .repartition(width, $"bucket")
    val others = explodedBuckets(wins)
      .select($"user_id".as("other_id"), $"au".as("o_au"), $"bu".as("o_bu"), $"bucket")
      .repartition(width, $"bucket")
    val pairs = buyers.join(others,
        buyers("bucket") === others("bucket") &&
        $"buyer_id" =!= $"other_id" &&
        $"p_au" < $"o_bu" && $"o_au" < $"p_bu" &&
        // anchor-bucket condition: emit the pair exactly once
        buyers("bucket") === expr(s"greatest(p_au, o_au) div ${BucketUs}L"))
      .select($"buyer_id", $"other_id",
        (least($"p_bu", $"o_bu") - greatest($"p_au", $"o_au")).as("ov"))
    pairs.groupBy($"buyer_id", $"other_id")
      .agg(count(lit(1)).as("n_overlaps"), sum($"ov").as("overlap_us"))
      .withColumn("rk", row_number().over(
        Window.orderBy($"overlap_us".desc, $"buyer_id".asc, $"other_id".asc)))
      .filter($"rk" <= 20)
      .select($"rk", $"buyer_id", $"other_id", $"n_overlaps", $"overlap_us")
      .orderBy($"rk")
  }

  val q175Sql: String =
    s"""$windowsCte,
       |p AS (SELECT * FROM w WHERE has_purchase = 1),
       |pairs AS (
       |  SELECT p.user_id AS buyer_id, o.user_id AS other_id,
       |         epoch_us(least(p.w_end, o.w_end)) -
       |         epoch_us(greatest(p.w_start, o.w_start)) AS ov
       |  FROM p JOIN w o
       |    ON o.user_id <> p.user_id
       |   AND p.w_start < o.w_end AND o.w_start < p.w_end),
       |agg AS (
       |  SELECT buyer_id, other_id, count(*) AS n_overlaps,
       |         CAST(sum(ov) AS BIGINT) AS overlap_us
       |  FROM pairs GROUP BY buyer_id, other_id),
       |r AS (
       |  SELECT buyer_id, other_id, n_overlaps, overlap_us,
       |         row_number() OVER (ORDER BY overlap_us DESC, buyer_id ASC, other_id ASC) AS rk
       |  FROM agg)
       |SELECT rk, buyer_id, other_id, n_overlaps, overlap_us
       |FROM r WHERE rk <= 20 ORDER BY rk""".stripMargin

  /** q204: the range join as pure SQL TEXT — the whole q174 pipeline
    * (sessionize → dilate → bucket-explode → equi-join → exact
    * predicate → left-outer zeros) submitted through `spark.sql`,
    * because unlike the custom plan-node tiers (which needed
    * table-valued functions, q126–q128) the bucket decomposition is
    * built ENTIRELY from SQL-surface primitives: `sequence`,
    * `explode`, `div`, window functions. A SQL-shaped consumer gets
    * the 100 TB-safe plan by writing this text — no Scala required —
    * and the q126 grading pattern applies: same oracle as the
    * DataFrame form, two front doors, one answer. */
  def q204RangeJoinSql(s: SparkSession, dir: String): DataFrame = {
    graft.Tables.events(s, dir).createOrReplaceTempView("graft_q204_events")
    s.sql(
      s"""WITH ev AS (
         |  SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
         |  FROM graft_q204_events),
         |flagged AS (
         |  SELECT user_id, event_id, ts, event_type, value,
         |    CASE WHEN lag(ts) OVER w IS NULL
         |           OR unix_micros(ts) - unix_micros(lag(ts) OVER w) > 1800000000L
         |         THEN 1 ELSE 0 END AS new_sess
         |  FROM ev
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |sess AS (
         |  SELECT user_id, ts, event_type,
         |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |                        ROWS UNBOUNDED PRECEDING) AS sess_id
         |  FROM flagged),
         |w AS (
         |  SELECT user_id, sess_id, min(ts) AS w_start,
         |         max(ts) + INTERVAL 30 MINUTES AS w_end,
         |         unix_micros(CAST(min(ts) AS TIMESTAMP)) AS au,
         |         unix_micros(CAST(max(ts) + INTERVAL 30 MINUTES AS TIMESTAMP)) AS bu
         |  FROM sess GROUP BY user_id, sess_id),
         |wb AS (
         |  SELECT user_id, sess_id, au, bu,
         |    explode(sequence(au div ${BucketUs}L, (bu - 1) div ${BucketUs}L)) AS bucket
         |  FROM w),
         |err AS (
         |  SELECT user_id AS e_user, unix_micros(ts) AS tu, value,
         |         unix_micros(ts) div ${BucketUs}L AS bucket
         |  FROM ev WHERE event_type = 'error'),
         |hits AS (
         |  SELECT wb.user_id, wb.sess_id, count(1) AS n,
         |    round(CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE), 2) AS v
         |  FROM wb JOIN err
         |    ON wb.bucket = err.bucket AND err.tu >= wb.au AND err.tu < wb.bu
         |   AND err.e_user <> wb.user_id
         |  GROUP BY wb.user_id, wb.sess_id)
         |SELECT w.user_id, w.sess_id, w.w_start, w.w_end,
         |       coalesce(h.n, 0L) AS n_err,
         |       coalesce(h.v, CAST(0.0 AS DOUBLE)) AS err_value
         |FROM w LEFT JOIN hits h
         |  ON h.user_id = w.user_id AND h.sess_id = w.sess_id
         |ORDER BY w.user_id, w.sess_id""".stripMargin)
  }

  /** q205: LINEAR multi-touch attribution — each purchase's credit
    * split equally across the same user's view/click touches in the
    * preceding 30 minutes, reported per touch type. The marketing
    * counterpart of q113's last-touch rule: last-touch gives the final
    * click everything; linear pays every touch 1/n.
    *
    * Exact integer accounting: each touch gets `⌊10⁶/n⌋` ppm and the
    * EARLIEST touch additionally receives the remainder (rule in the
    * query text), so every purchase distributes exactly 10⁶ ppm and
    * the per-type sums are BIGINT-exact. The touch lookup is the
    * bucketed point-in-interval join keyed by (user, bucket) — the
    * purchase's look-back window explodes to ≤ 2 buckets, touches tag
    * one, and the per-user key keeps buckets sparse. */
  def q205LinearAttribution(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val e = ev(s, dir)
    val purchases = e.filter($"event_type" === "purchase")
      .select($"event_id".as("p_id"), $"user_id".as("p_user"),
        unix_micros($"ts".cast("timestamp")).as("pu"))
      .withColumn("au", $"pu" - lit(BucketUs))
      .withColumn("bucket", explode(sequence(
        expr(s"au div ${BucketUs}L"), expr(s"(pu - 1) div ${BucketUs}L"))))
    val touches = e.filter($"event_type".isin("view", "click"))
      .select($"event_id".as("t_id"), $"user_id".as("t_user"),
        $"event_type".as("touch_type"),
        unix_micros($"ts".cast("timestamp")).as("tu"))
      .withColumn("bucket", expr(s"tu div ${BucketUs}L"))
    val hits = purchases.join(touches,
        purchases("bucket") === touches("bucket") &&
        $"p_user" === $"t_user" && $"tu" >= $"au" && $"tu" < $"pu")
      .select($"p_id", $"t_id", $"touch_type", $"tu")
    val wN = Window.partitionBy($"p_id")
    val wOrd = Window.partitionBy($"p_id").orderBy($"tu".asc, $"t_id".asc)
    hits
      .withColumn("n", count(lit(1)).over(wN))
      .withColumn("rk", row_number().over(wOrd))
      .withColumn("ppm",
        expr("1000000L div n") +
          when($"rk" === 1, lit(1000000L) - $"n" * expr("1000000L div n"))
            .otherwise(0L))
      .groupBy($"touch_type")
      .agg(count(lit(1)).as("n_touches"),
        countDistinct($"p_id").as("n_purchases_touched"),
        sum($"ppm").as("credit_ppm"))
      .withColumn("attributed_conversions",
        round($"credit_ppm".cast("double") / 1000000.0, 4))
      .orderBy($"touch_type")
  }

  val q205Sql: String =
    s"""$evCte,
       |p AS (SELECT event_id AS p_id, user_id AS p_user, epoch_us(ts) AS pu
       |      FROM ev WHERE event_type = 'purchase'),
       |t AS (SELECT event_id AS t_id, user_id AS t_user, event_type AS touch_type,
       |             epoch_us(ts) AS tu
       |      FROM ev WHERE event_type IN ('view', 'click')),
       |hits AS (
       |  SELECT p.p_id, t.t_id, t.touch_type, t.tu
       |  FROM p JOIN t ON t.t_user = p.p_user
       |   AND t.tu >= p.pu - 1800000000 AND t.tu < p.pu),
       |cr AS (
       |  SELECT p_id, touch_type,
       |    count(*) OVER (PARTITION BY p_id) AS n,
       |    row_number() OVER (PARTITION BY p_id ORDER BY tu ASC, t_id ASC) AS rk
       |  FROM hits),
       |ppm AS (
       |  SELECT touch_type, p_id,
       |    (1000000 // n) + CASE WHEN rk = 1
       |        THEN 1000000 - n * (1000000 // n) ELSE 0 END AS ppm
       |  FROM cr)
       |SELECT touch_type, count(*) AS n_touches,
       |  count(DISTINCT p_id) AS n_purchases_touched,
       |  CAST(sum(ppm) AS BIGINT) AS credit_ppm,
       |  round(CAST(sum(ppm) AS DOUBLE) / 1000000.0, 4) AS attributed_conversions
       |FROM ppm GROUP BY touch_type ORDER BY touch_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q174_range_join" -> (q174RangeJoin _),
    "q175_interval_overlap" -> (q175IntervalOverlap _),
    "q204_range_join_sql" -> (q204RangeJoinSql _),
    "q205_linear_attribution" -> (q205LinearAttribution _),
  )

  val oracle: Map[String, String] = Map(
    "q174_range_join" -> q174Sql,
    "q175_interval_overlap" -> q175Sql,
    // same output contract as q174 — one oracle grades both front doors
    "q204_range_join_sql" -> q174Sql,
    "q205_linear_attribution" -> q205Sql,
  )
}
