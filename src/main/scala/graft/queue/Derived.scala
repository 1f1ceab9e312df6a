package graft.queue

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.model.PhaseStatus

/** Parquet-derived twins of the queue domain, so the reference's core
  * scheduler semantics are graded by the DuckDB hash oracle instead of
  * rows-only (the fixture tables in [[Fixtures]] live in memory where
  * the oracle can't see them — same trick as `rounds.Stratify`, which
  * derives the phase DAG from `lineitem`).
  *
  * Deterministic mapping (both engines compute it from the same
  * parquet, so the derivation IS the test fixture):
  *  - plan      = order: status O→queued / P→active / F→completed,
  *    plan type from o_orderpriority class, project = custkey mod 5,
  *    created_at = o_orderdate (ref plan shape `commands/nova.md:269`).
  *  - phase     = lineitem line; "file touched" = l_partkey; complexity
  *    tiers from l_quantity (ref `commands/nova.md:290-373`).
  *  - status    = per-line lifecycle from (l_linestatus, l_returnflag):
  *    F,R→failed / F,_→completed / O,N→running / O,A→starting /
  *    O,R→stalled; tool_count = quantity; phase runtime = one minute
  *    per tool (ref status shape `commands/pulsar.md:335-345`).
  *
  * Scale: all derivations are narrow projections; the dependency
  * detector self-joins on (project, file) — shuffle-partitioned by
  * file key exactly like the production `QueueOps.interPlanDeps`, and
  * scoped to a project so one hot file doesn't couple every plan pair.
  */
object Derived {

  /** Pinned "now" for age-based priority (determinism on both engines). */
  val AsOf = "2000-01-01 00:00:00"

  /** Derived plan-queue table: (id, project, status, plan_type,
    * exec_mode, created_at). */
  def plans(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, dir).select(
      $"o_orderkey".as("id"),
      concat(lit("proj_"), ($"o_custkey" % 5).cast("string")).as("project"),
      when($"o_orderstatus" === "O", "queued")
        .when($"o_orderstatus" === "P", "active")
        .otherwise("completed").as("status"),
      when(substring($"o_orderpriority", 1, 1) === "1", "bug")
        .when(substring($"o_orderpriority", 1, 1) === "2", "feature")
        .when(substring($"o_orderpriority", 1, 1) === "3", "refactor")
        .when(substring($"o_orderpriority", 1, 1) === "4", "chore")
        .otherwise("docs").as("plan_type"),
      when(substring($"o_orderpriority", 1, 1).isin("1", "2"), "interactive")
        .otherwise("background").as("exec_mode"),
      $"o_orderdate".as("created_at"))
  }

  val plansCte: String =
    """plans AS (
      |  SELECT o_orderkey AS id,
      |         'proj_' || CAST(o_custkey % 5 AS VARCHAR) AS project,
      |         CASE o_orderstatus WHEN 'O' THEN 'queued'
      |                            WHEN 'P' THEN 'active'
      |                            ELSE 'completed' END AS status,
      |         CASE substr(o_orderpriority, 1, 1)
      |           WHEN '1' THEN 'bug' WHEN '2' THEN 'feature'
      |           WHEN '3' THEN 'refactor' WHEN '4' THEN 'chore'
      |           ELSE 'docs' END AS plan_type,
      |         CASE WHEN substr(o_orderpriority, 1, 1) IN ('1','2')
      |              THEN 'interactive' ELSE 'background' END AS exec_mode,
      |         o_orderdate AS created_at
      |  FROM orders)""".stripMargin

  /** Derived per-phase status table, typed as the reference's
    * PhaseStatus record so the real S16/S18 operators run over it. */
  def statuses(s: SparkSession, dir: String): Dataset[PhaseStatus] = {
    import s.implicits._
    val proj = plans(s, dir).select($"id".as("okey"), $"project")
    Tables.lineitem(s, dir)
      .join(proj, $"l_orderkey" === $"okey")
      .select(
        concat(lit("phase-"), $"l_linenumber".cast("string"),
          lit("-"), $"l_orderkey".cast("string")).as("task_id"),
        $"project",
        $"l_orderkey".cast("string").as("plan_id"),
        $"l_linenumber".as("phase"),
        lit(null).cast("string").as("thread_id"),
        when($"l_linestatus" === "F" && $"l_returnflag" === "R", "failed")
          .when($"l_linestatus" === "F", "completed")
          .when($"l_returnflag" === "N", "running")
          .when($"l_returnflag" === "A", "starting")
          .otherwise("stalled").as("status"),
        $"l_quantity".cast("int").as("tool_count"),
        when($"l_returnflag" === "R", "Bash")
          .when($"l_returnflag" === "A", "Edit")
          .otherwise("Write").as("last_tool"),
        concat(lit("part-"), $"l_partkey".cast("string"), lit(".ts")).as("last_file"),
        coalesce(
          when($"l_linestatus" === "F",
            $"l_shipdate" + expr("make_dt_interval(0, 0, CAST(l_quantity AS INT), 0)")),
          $"l_shipdate").cast("timestamp").as("updated_at"),
        $"l_shipdate".cast("timestamp").as("started_at"),
        when($"l_linestatus" === "F",
          $"l_shipdate" + expr("make_dt_interval(0, 0, CAST(l_quantity AS INT), 0)"))
          .cast("timestamp").as("completed_at"))
      .as[PhaseStatus]
  }

  val statusesCte: String =
    """statuses AS (
      |  SELECT 'proj_' || CAST(o_custkey % 5 AS VARCHAR) AS project,
      |         CAST(l_orderkey AS VARCHAR) AS plan_id,
      |         l_linenumber AS phase,
      |         CASE WHEN l_linestatus = 'F' AND l_returnflag = 'R' THEN 'failed'
      |              WHEN l_linestatus = 'F' THEN 'completed'
      |              WHEN l_returnflag = 'N' THEN 'running'
      |              WHEN l_returnflag = 'A' THEN 'starting'
      |              ELSE 'stalled' END AS status,
      |         CAST(l_quantity AS INT) AS tool_count,
      |         l_shipdate AS started_at,
      |         CASE WHEN l_linestatus = 'F'
      |              THEN l_shipdate + CAST(l_quantity AS INT) * INTERVAL 1 MINUTE
      |         END AS completed_at,
      |         CASE WHEN l_linestatus = 'F'
      |              THEN l_shipdate + CAST(l_quantity AS INT) * INTERVAL 1 MINUTE
      |              ELSE l_shipdate END AS updated_at
      |  FROM lineitem JOIN orders ON o_orderkey = l_orderkey)""".stripMargin

  /** q42 — the scheduler pipeline (S5 dependency detection → S6
    * eligibility → S7 priority → S8 top-1 pick, ref `agents/
    * orbiter.md:55-90`) over the derived queue. Two plans of a project
    * are dependent when they touch the same file (= part key), the
    * later depending on the earlier. */
  def q42SchedulerPick(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val p = plans(s, dir)
    val files = Tables.lineitem(s, dir)
      .select($"l_orderkey".as("id"), $"l_partkey".as("file")).distinct()
    val pf = files.join(p.select($"id", $"project", $"created_at"), Seq("id"))
    // dependent (left) side restricted to queued plans: only their
    // eligibility and unblock counts matter, and the cut shrinks the
    // (project, file) self-join ~3x — the 100 TB version of "filter
    // before the expensive join", not after it
    val pfQueued = files.join(
      p.filter($"status" === "queued").select($"id", $"project", $"created_at"), Seq("id"))
    val b = pf.select($"id".as("id2"), $"project".as("proj2"),
      $"created_at".as("created2"), $"file".as("file2"))
    val deps = pfQueued.join(b,
        $"file" === $"file2" && $"project" === $"proj2" &&
        ($"created2" < $"created_at" ||
         ($"created2" === $"created_at" && $"id2" < $"id")))
      .select($"id".as("plan_id"), $"id2".as("depends_on")).distinct()

    val completed = p.filter($"status" === "completed").select($"id".as("cid"))
    val unmet = deps.join(completed, $"depends_on" === $"cid", "left_anti")
    val elig = p.filter($"status" === "queued")
      .join(unmet.select($"plan_id").distinct(), $"id" === $"plan_id", "left_anti")

    val nph = Tables.lineitem(s, dir)
      .groupBy($"l_orderkey".as("nid"))
      .agg(countDistinct($"l_linenumber").as("n_phases"))
    val unblocks = deps.groupBy($"depends_on".as("uid"))
      .agg(count(lit(1)).as("n_unblocked"))

    val asOfUs = java.sql.Timestamp.valueOf(AsOf).getTime * 1000L
    elig.join(nph, $"id" === $"nid")
      .join(unblocks, $"id" === $"uid", "left")
      .withColumn("base",
        when($"plan_type" === "bug", 1)
          .when($"plan_type" === "feature", 2)
          .when($"plan_type" === "refactor", 3)
          .when($"plan_type" === "chore", 4)
          .otherwise(5))
      .withColumn("adj_unblocks",
        when(coalesce($"n_unblocked", lit(0L)) > 0, -1).otherwise(0))
      .withColumn("waited_days",
        floor((lit(asOfUs) - unix_micros($"created_at".cast("timestamp"))) / 86400000000.0))
      .withColumn("adj_age", when($"waited_days" >= 3, -1).otherwise(0))
      .withColumn("adj_size", when($"n_phases" >= 6, 1).otherwise(0))
      .withColumn("priority",
        least(greatest($"base" + $"adj_unblocks" + $"adj_age" + $"adj_size", lit(1)), lit(5)))
      .orderBy($"priority".asc, $"created_at".asc, $"id".asc)
      .limit(1)
      .select($"id", $"project", $"plan_type", $"priority")
  }

  val q42Sql: String =
    s"""WITH $plansCte,
      |files AS (SELECT DISTINCT l_orderkey AS id, l_partkey AS file FROM lineitem),
      |pf AS (
      |  SELECT f.id, p.project, p.created_at, f.file
      |  FROM files f JOIN plans p ON p.id = f.id),
      |pfq AS (
      |  SELECT f.id, p.project, p.created_at, f.file
      |  FROM files f JOIN plans p ON p.id = f.id
      |  WHERE p.status = 'queued'),
      |deps AS (
      |  SELECT DISTINCT a.id AS plan_id, b.id AS depends_on
      |  FROM pfq a JOIN pf b
      |    ON a.file = b.file AND a.project = b.project
      |   AND (b.created_at < a.created_at
      |        OR (b.created_at = a.created_at AND b.id < a.id))),
      |nph AS (
      |  SELECT l_orderkey AS id, count(DISTINCT l_linenumber) AS n_phases
      |  FROM lineitem GROUP BY 1),
      |unmet AS (
      |  SELECT DISTINCT d.plan_id FROM deps d
      |  WHERE d.depends_on NOT IN (SELECT id FROM plans WHERE status = 'completed')),
      |elig AS (
      |  SELECT p.* FROM plans p
      |  WHERE p.status = 'queued' AND p.id NOT IN (SELECT plan_id FROM unmet)),
      |unbl AS (
      |  SELECT depends_on AS uid, count(*) AS n_unblocked FROM deps GROUP BY 1),
      |prio AS (
      |  SELECT e.id, e.project, e.plan_type, e.created_at,
      |    CASE e.plan_type WHEN 'bug' THEN 1 WHEN 'feature' THEN 2
      |                     WHEN 'refactor' THEN 3 WHEN 'chore' THEN 4
      |                     ELSE 5 END
      |    + (CASE WHEN coalesce(u.n_unblocked, 0) > 0 THEN -1 ELSE 0 END)
      |    + (CASE WHEN floor((epoch_us(TIMESTAMP '$AsOf') - epoch_us(e.created_at))
      |                       / 86400000000.0) >= 3 THEN -1 ELSE 0 END)
      |    + (CASE WHEN n.n_phases >= 6 THEN 1 ELSE 0 END) AS raw
      |  FROM elig e
      |  JOIN nph n ON n.id = e.id
      |  LEFT JOIN unbl u ON u.uid = e.id)
      |SELECT id, project, plan_type,
      |       CAST(least(greatest(raw, 1), 5) AS INT) AS priority
      |FROM prio ORDER BY priority, created_at, id LIMIT 1""".stripMargin

  /** q43 — status overview + ETA (S18/S19) over the derived status
    * table, through the production operators. */
  def q43StatusOverview(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val st = statuses(s, dir)
    QueueOps.statusOverview(st)
      .join(QueueOps.etaSeconds(st), Seq("plan_id"), "left")
      .orderBy($"project", $"plan_id")
  }

  val q43Sql: String =
    s"""WITH $statusesCte,
      |ov AS (
      |  SELECT project, plan_id,
      |    count(*) AS n_phases,
      |    CAST(sum(CASE WHEN status = 'completed' THEN 1 ELSE 0 END) AS BIGINT) AS n_completed,
      |    CAST(sum(CASE WHEN status = 'failed' THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
      |    CAST(sum(CASE WHEN status = 'running' THEN 1 ELSE 0 END) AS BIGINT) AS n_running,
      |    CAST(sum(tool_count) AS BIGINT) AS total_tools,
      |    max(updated_at) AS last_update,
      |    round(sum(CASE WHEN status = 'completed' THEN 1 ELSE 0 END) * 100.0 / count(*), 1)
      |      AS pct_complete
      |  FROM statuses GROUP BY project, plan_id),
      |eta AS (
      |  SELECT s.plan_id,
      |    CAST(sum(CASE WHEN status <> 'completed' THEN 1 ELSE 0 END) AS BIGINT) AS n_remaining,
      |    round(coalesce(avg(CASE WHEN status = 'completed' AND completed_at IS NOT NULL
      |          THEN (epoch_us(completed_at) - epoch_us(started_at)) / 1000000.0 END), 0.0)
      |      * sum(CASE WHEN status <> 'completed' THEN 1 ELSE 0 END), 1) AS eta_sec
      |  FROM statuses s GROUP BY s.plan_id)
      |SELECT o.project, o.plan_id, o.n_phases, o.n_completed, o.n_failed,
      |       o.n_running, o.total_tools, o.last_update, o.pct_complete,
      |       e.n_remaining, e.eta_sec
      |FROM ov o LEFT JOIN eta e ON e.plan_id = o.plan_id
      |ORDER BY o.project, o.plan_id""".stripMargin

  /** q45 — pulse rollup (S16) over the derived status table, through
    * the production `Streams.pulse`. */
  def q45Pulse(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.streaming.Streams.pulse(statuses(s, dir))
      .orderBy($"project", $"plan_id")
  }

  val q45Sql: String =
    s"""WITH $statusesCte
      |SELECT project, plan_id,
      |  count(*) AS n_phases,
      |  CAST(sum(CASE WHEN status = 'completed' THEN 1 ELSE 0 END) AS BIGINT) AS n_completed,
      |  CAST(sum(CASE WHEN status = 'failed' THEN 1 ELSE 0 END) AS BIGINT) AS n_failed,
      |  CAST(sum(CASE WHEN status IN ('running','starting') THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
      |  CAST(sum(CASE WHEN status = 'stalled' THEN 1 ELSE 0 END) AS BIGINT) AS n_stalled,
      |  CAST(sum(tool_count) AS BIGINT) AS total_tools,
      |  max(updated_at) AS last_update
      |FROM statuses GROUP BY project, plan_id
      |ORDER BY project, plan_id""".stripMargin

  /** q51 — cost-based model routing (S10, ref `commands/pulsar.md:
    * 114-137`) over derived phases: complexity tiers from quantity,
    * routed through the production `TranscriptEtl.routeModels`. */
  def q51ModelRouting(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val phases = Tables.lineitem(s, dir).select(
      $"l_orderkey".as("plan_id"), $"l_linenumber".as("phase"),
      when($"l_quantity" >= 35, "High (Implementation)")
        .when($"l_quantity" >= 15, "Medium")
        .otherwise("Low").as("complexity"))
    TranscriptEtl.routeModels(phases)
      .groupBy($"executor")
      .agg(count(lit(1)).as("n_phases"),
        countDistinct($"plan_id").as("n_plans"))
      .orderBy($"executor")
  }

  val q51Sql: String =
    """SELECT
      |  CASE WHEN l_quantity >= 15 THEN 'heavy' ELSE 'light' END AS executor,
      |  count(*) AS n_phases,
      |  count(DISTINCT l_orderkey) AS n_plans
      |FROM lineitem
      |GROUP BY 1 ORDER BY executor""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q42_scheduler_pick"  -> (q42SchedulerPick _),
    "q43_status_overview" -> (q43StatusOverview _),
    "q45_pulse"           -> (q45Pulse _),
    "q51_model_routing"   -> (q51ModelRouting _),
  )

  val oracle: Map[String, String] = Map(
    "q42_scheduler_pick"  -> q42Sql,
    "q43_status_overview" -> q43Sql,
    "q45_pulse"           -> q45Sql,
    "q51_model_routing"   -> q51Sql,
  )
}
