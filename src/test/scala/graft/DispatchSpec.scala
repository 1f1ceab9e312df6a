package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{Dispatch, Streams}

class DispatchSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  test("S11 round executor: every phase runs, rounds keep their order") {
    val strata = Seq((1L, 1, 1), (1L, 2, 1), (1L, 3, 2), (2L, 1, 1), (2L, 2, 2))
      .toDF("plan", "phase", "round")
    val log = Dispatch.executeRounds(strata, (p, ph) => s"done-$p-$ph").collect()
    assert(log.length == 5)
    // job_seq increases with round: all round-1 phases ran in job 0
    val byRound = log.groupBy(_.getAs[Int]("round"))
      .view.mapValues(_.map(_.getAs[Int]("job_seq")).toSet).toMap
    assert(byRound(1) == Set(0) && byRound(2) == Set(1))
    assert(log.forall(r => r.getAs[String]("result") ==
      s"done-${r.getAs[Long]("plan")}-${r.getAs[Int]("phase")}"))
  }

  test("S26 bounded retry: succeeds within budget, gives up after max") {
    var calls = 0
    val (attempts, res) = Dispatch.withBoundedRetry(2) { () =>
      calls += 1
      if (calls < 3) throw new RuntimeException("flaky")
      "ok"
    }
    assert(attempts == 3 && res.contains("ok"))
    var calls2 = 0
    val (attempts2, res2) = Dispatch.withBoundedRetry(2) { () =>
      calls2 += 1
      throw new RuntimeException("always")
    }
    assert(attempts2 == 3 && res2.isEmpty)
  }

  test("S23 dispatch sink: one dispatch record per queued plan with claim pid") {
    val inDir = java.nio.file.Files.createTempDirectory("disp_in").toFile
    val outDir = java.nio.file.Files.createTempDirectory("disp_out").toFile
    outDir.delete()
    (1 to 3).foreach { i =>
      val w = new java.io.PrintWriter(new java.io.File(inDir, s"plan-$i.json"))
      w.println(s"""{"id":"plan-$i","title":"t","project":"alpha","projectPath":"/p","planType":"bug","status":"queued","executionMode":"background","path":"q/plan-$i.json","createdAt":"2026-01-01T10:00:00.000Z","phases":1,"parallelGroups":1}""")
      w.close()
    }
    val q = Dispatch.dispatchSink(
      Streams.queueStream(spark, inDir.getAbsolutePath), outDir.getAbsolutePath)
    q.awaitTermination(60000)
    val out = spark.read.json(outDir.getAbsolutePath)
    assert(out.count() == 3)
    assert(out.select("id").collect().map(_.getString(0)).toSet ==
      Set("plan-1", "plan-2", "plan-3"))
    // single-flight: 3 distinct batch ids = one plan per trigger
    assert(out.select("pid").distinct().count() == 3)
  }

  test("S27 capability detection reports session feature flags") {
    val caps = Dispatch.detectCapabilities(spark).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(caps("spark_version").startsWith("4."))
    assert(caps("session_tz") == "UTC")
    assert(caps.contains("aqe") && caps.contains("codegen"))
  }

  test("S28 scatter-gather: branch union covers the corpus exactly once") {
    val docs = Tables.documents(spark, sf)
    val branches = Seq("en", "de", "fr", "es", "zh").map { l =>
      docs.filter($"lang" === l)
        .groupBy($"lang").agg(count(lit(1)).as("n"))
    }
    val gathered = Dispatch.scatterGather(branches)
    assert(gathered.agg(sum($"n")).head().getLong(0) == docs.count())
  }
}

class RoundtripSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  test("sources/sinks: csv, json, partitioned parquet round-trip documents") {
    val docs = Tables.documents(spark, sf)
      .select($"doc_id", $"lang", $"source", $"n_chars")
    val base = java.nio.file.Files.createTempDirectory("rt").toString
    // csv
    docs.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    val csvBack = spark.read.option("header", "true")
      .option("inferSchema", "true").csv(s"$base/csv")
    assert(csvBack.count() == docs.count())
    // json
    docs.write.mode("overwrite").json(s"$base/json")
    assert(spark.read.json(s"$base/json").count() == docs.count())
    // partitioned parquet: partition pruning must reach the file listing
    docs.write.mode("overwrite").partitionBy("lang").parquet(s"$base/pq")
    val en = spark.read.parquet(s"$base/pq").filter($"lang" === "en")
    val plan = en.queryExecution.executedPlan.toString
    assert(en.count() == docs.filter($"lang" === "en").count())
    // text sink (single string column)
    docs.select(concat_ws("|", $"doc_id", $"lang").as("value"))
      .write.mode("overwrite").text(s"$base/txt")
    assert(spark.read.text(s"$base/txt").count() == docs.count())
    // ORC round-trip (orc-core ships with the Spark distribution)
    docs.write.mode("overwrite").orc(s"$base/orc")
    assert(spark.read.orc(s"$base/orc").count() == docs.count())
    // zstd-compressed parquet round-trip
    docs.write.mode("overwrite").option("compression", "zstd").parquet(s"$base/pq_zstd")
    val zfiles = new java.io.File(s"$base/pq_zstd").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    assert(zfiles.forall(_.getName.contains("zstd")), "zstd codec not applied")
    assert(spark.read.parquet(s"$base/pq_zstd").count() == docs.count())
  }

  /** The reference daemon's full loop (`scripts/starry-daemon.sh:209-226`):
    * plans wait under queued/{background,interactive}, are admitted ONE at
    * a time, move to active/ while their phases execute, and land in
    * completed/ — driven end-to-end through queueStream → dispatchSink →
    * statusStream. */
  test("lifecycle integration: queued -> dispatched -> active -> completed, one plan in flight") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import java.sql.Timestamp
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import graft.model.ToolEvent
    import graft.streaming.Lifecycle

    val root = Files.createTempDirectory("daemon").toFile
    val queuedBg = new java.io.File(root, "queued/background"); queuedBg.mkdirs()
    val queuedIa = new java.io.File(root, "queued/interactive"); queuedIa.mkdirs()
    val active = new java.io.File(root, "active"); active.mkdirs()
    val completed = new java.io.File(root, "completed"); completed.mkdirs()

    def writePlan(dir: java.io.File, id: String, mode: String): java.io.File = {
      val f = new java.io.File(dir, s"$id.json")
      val w = new java.io.PrintWriter(f)
      w.println(s"""{"id":"$id","title":"t","project":"alpha","projectPath":"/p","planType":"feature","status":"queued","executionMode":"$mode","path":"queued/$mode/$id.json","createdAt":"2026-01-01T10:00:00.000Z","phases":1,"parallelGroups":1}""")
      w.close(); f
    }
    val planFiles = Map(
      "plan-a" -> writePlan(queuedBg, "plan-a", "background"),
      "plan-b" -> writePlan(queuedBg, "plan-b", "background"),
      "plan-c" -> writePlan(queuedIa, "plan-c", "interactive"))

    // 1. admission: the queue stream tails BOTH queue subdirs; the
    //    dispatch sink claims one plan per trigger (single flight)
    val q = Dispatch.dispatchSink(
      Streams.queueStream(spark, root.getAbsolutePath + "/queued/*"),
      root.getAbsolutePath + "/dispatched")
    q.awaitTermination(60000)
    val dispatched = spark.read.json(root.getAbsolutePath + "/dispatched")
    assert(dispatched.count() == 3)
    assert(dispatched.select("pid").distinct().count() == 3,
      "one-plan-in-flight violated: plans shared a dispatch batch")

    // 2. execution: each dispatched plan moves queued -> active, its
    //    events run through the status state machine to completion, and
    //    the plan file moves active -> completed — never two in active/
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ToolEvent]
    val statuses = Lifecycle.statusStream(mem.toDS(), watermarkDelay = "0 seconds")
    val sq = statuses.writeStream.format("memory").queryName("daemon_statuses")
      .outputMode("update").start()
    try {
      var t = 0L
      def ts(): Timestamp = { t += 60000L; new Timestamp(1767265200000L + t) }
      val order = dispatched.orderBy("pid").select("id").collect().map(_.getString(0))
      order.foreach { id =>
        val src = planFiles(id).toPath
        val act = Paths.get(active.getAbsolutePath, src.getFileName.toString)
        Files.move(src, act, StandardCopyOption.ATOMIC_MOVE)
        assert(active.listFiles().length == 1, "two plans in active/ at once")
        mem.addData(
          ToolEvent(id, 1, "alpha", "Session", None, "start", ts()),
          ToolEvent(id, 1, "alpha", "Edit", Some("a.ts"), "tool", ts()),
          ToolEvent(id, 1, "alpha", "", None, "stop_completed", ts()))
        sq.processAllAvailable()
        val st = spark.table("daemon_statuses")
          .filter($"plan_id" === id).orderBy($"updated_at".desc).head()
        assert(st.getAs[String]("status") == "completed", s"$id not completed")
        Files.move(act, Paths.get(completed.getAbsolutePath, src.getFileName.toString),
          StandardCopyOption.ATOMIC_MOVE)
      }
    } finally sq.stop()

    // 3. final tree: queues drained, nothing stuck in active, all done
    assert(queuedBg.listFiles().isEmpty && queuedIa.listFiles().isEmpty)
    assert(active.listFiles().isEmpty)
    assert(completed.listFiles().map(_.getName).toSet ==
      Set("plan-a.json", "plan-b.json", "plan-c.json"))
  }
}
