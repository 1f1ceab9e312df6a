package graft.queue

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S24 — transcript → structured report ETL (ref `agents/
  * output-processor.md:35-95`): regex-driven extraction from raw CLI
  * transcript text into the nested report shape {status, tests{...},
  * files[], commits[], errors[]}. Pure `regexp_extract_all`/`rlike`
  * projection — one narrow codegen'd pass per transcript, trivially
  * parallel at any scale.
  */
object TranscriptEtl {

  /** Classify + extract one report row per transcript.
    * Expects columns (id, transcript). */
  def parse(transcripts: DataFrame): DataFrame = {
    val s = transcripts.sparkSession
    import s.implicits._
    transcripts
      // test results first (output-processor.md:49-53) so the status
      // classifier can distinguish "0 failed" from real failures
      .withColumn("tp",
        coalesce(nullif(regexp_extract($"transcript", "(\\d+)\\s+passed", 1), lit(""))
          .cast("int"), lit(0)))
      .withColumn("tf",
        coalesce(nullif(regexp_extract($"transcript", "(\\d+)\\s+failed", 1), lit(""))
          .cast("int"), lit(0)))
      // status classification (output-processor.md:64-71)
      .withColumn("status",
        when($"transcript".rlike("(?i)(fatal|unrecoverable|cannot continue)"), "failed")
          .when($"transcript".rlike("(?i)(error|exception)") || $"tf" > 0,
            "completed_with_errors")
          .otherwise("completed"))
      // file-op detection (:73-80)
      .withColumn("files_modified",
        array_distinct(expr(
          "transform(regexp_extract_all(transcript, '(?:Created|Modified|Updated|Wrote|Edited)\\\\s+(\\\\S+\\\\.\\\\w+)', 1), x -> x)")))
      // commit detection (:82-87) — require the bracketed [hash] form.
      // (A bare \b hex \b with an OPTIONAL ]-lookahead constrained
      // nothing: any 7+-char hex-alphabet word — 'deadbeef', a color
      // code — was reported as a commit.)
      .withColumn("commits",
        regexp_extract_all($"transcript", lit("\\[([0-9a-f]{7,40})\\]"), lit(1)))
      .withColumnRenamed("tp", "tests_passed")
      .withColumnRenamed("tf", "tests_failed")
      // error lines (:89-95)
      .withColumn("errors",
        regexp_extract_all($"transcript", lit("(?i)^.*(?:error|exception)[:\\s].*$"), lit(0)))
      .withColumn("report", to_json(struct(
        $"status", $"tests_passed", $"tests_failed",
        $"files_modified", $"commits")))
  }

  /** Fixture transcripts mirroring the reference's raw-CLI examples. */
  def fixture(s: SparkSession): DataFrame = {
    import s.implicits._
    Seq(
      (1L,
        """Phase 1 starting.
          |Created src/models/user.ts
          |Modified src/api/auth.ts
          |Running tests... 12 passed, 0 failed
          |Committed [a1b2c3d] feat: add user model""".stripMargin),
      (2L,
        """Phase 2 starting.
          |Error: TypeError: cannot read property 'id'
          |Updated src/app.ts
          |3 passed, 2 failed
          |retrying...""".stripMargin),
      (3L,
        """Phase 3: fatal: repository corrupt, cannot continue""".stripMargin)
    ).toDF("id", "transcript")
  }

  /** The ETL over fixture transcripts — regex semantics unit-tested in
    * EtlSpec; driver-graded twin: [[Derived.q50TranscriptEtl]]. */
  def fixtureTranscriptEtl(s: SparkSession): DataFrame = {
    import s.implicits._
    parse(fixture(s))
      .select($"id", $"status", $"tests_passed", $"tests_failed",
        concat_ws(",", $"files_modified").as("files"),
        concat_ws(",", $"commits").as("commit_hashes"))
      .orderBy($"id")
  }

  /** S10 — cost-based model routing (ref `commands/pulsar.md:114-137`,
    * `commands/nova.md:205-252`): complexity → executor class, default
    * light when the column is missing/unknown. */
  def routeModels(phases: DataFrame): DataFrame = {
    val s = phases.sparkSession
    import s.implicits._
    phases.withColumn("executor",
      when($"complexity".startsWith("High"), "heavy")
        .when($"complexity" === "Medium", "heavy")
        .otherwise("light"))
  }

  /** Routing over the fixture plans' phases, with per-executor totals
    * (the execution-log model aggregate, ref `commands/pulsar.md:
    * 635-638`). Driver-graded twin: [[Derived.q51ModelRouting]]. */
  def fixtureModelRouting(s: SparkSession): DataFrame = {
    import s.implicits._
    val phases = Fixtures.plans(s)
      .select($"id".as("plan_id"), explode($"phases").as("ph"))
      .select($"plan_id", $"ph.n".as("phase"), $"ph.complexity")
    routeModels(phases)
      .groupBy($"executor")
      .agg(count(lit(1)).as("n_phases"))
      .orderBy($"executor")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map.empty
}
