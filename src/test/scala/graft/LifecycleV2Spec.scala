package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.model.{PhaseStatus, ToolEvent}
import graft.streaming.LifecycleV2

class LifecycleV2Spec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try body finally prev match {
      case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }

  /** The reference daemon survives restarts (`scripts/starry-daemon.sh:
    * 209-226`): killing the process must lose NO lifecycle state. Here:
    * run the machine over a file source with a checkpoint, stop the
    * query mid-history, start a NEW query on the same checkpoint, and
    * assert claims (started_at), tool counters, and the stall timer
    * registered BEFORE the kill all resume exactly. */
  test("lifecycle machine recovers claims, counters and stall timers from a checkpoint") {
    withRocksDb {
      import java.nio.file.Files
      val inDir = Files.createTempDirectory("lc_in").toFile
      val ckpt = Files.createTempDirectory("lc_ckpt").toFile
      def writeFile(name: String, events: Seq[ToolEvent]): Unit = {
        val json = events.toDS().toJSON.collect().mkString("\n")
        Files.writeString(new java.io.File(inDir, name).toPath, json)
      }
      val src = spark.readStream
        .schema(implicitly[org.apache.spark.sql.Encoder[ToolEvent]].schema)
        .option("maxFilesPerTrigger", "1")
        .json(inDir.getAbsolutePath)
        .as[ToolEvent]
      val out = LifecycleV2.statusStream(src, watermarkDelay = "0 seconds")
      val seen = new java.util.concurrent.ConcurrentLinkedQueue[PhaseStatus]()
      def start() = out.writeStream
        .outputMode("update")
        .option("checkpointLocation", ckpt.getAbsolutePath)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[PhaseStatus], _: Long) =>
          batch.collect().foreach(seen.add)
        }
        .start()

      // run 1: phase 1 claimed + one tool; phase 2 claimed, then KILL
      writeFile("f1.json", Seq(
        ToolEvent("p", 1, "proj", "Session", None, "start", ts("2026-01-01 10:00:00")),
        ToolEvent("p", 1, "proj", "Edit", Some("a.ts"), "tool", ts("2026-01-01 10:01:00")),
        ToolEvent("p", 2, "proj", "Session", None, "start", ts("2026-01-01 10:00:30"))))
      val q1 = start()
      q1.processAllAvailable()
      q1.stop()
      val afterRun1 = seen.toArray(Array.empty[PhaseStatus])
      assert(afterRun1.exists(s => s.phase == 1 && s.tool_count == 1))
      seen.clear()

      // run 2, same checkpoint: phase 1 continues (+1 tool, completes);
      // phase 3 events push the watermark past phase 2's pre-kill stall
      // deadline (10:00:30 + 10 min)
      writeFile("f2.json", Seq(
        ToolEvent("p", 1, "proj", "Bash", None, "tool", ts("2026-01-01 10:05:00")),
        ToolEvent("p", 1, "proj", "", None, "stop_completed", ts("2026-01-01 10:06:00")),
        ToolEvent("p", 3, "proj", "Session", None, "start", ts("2026-01-01 10:30:00"))))
      writeFile("f3.json", Seq(
        ToolEvent("p", 3, "proj", "Bash", None, "tool", ts("2026-01-01 10:31:00"))))
      val q2 = start()
      q2.processAllAvailable()
      q2.stop()
      val afterRun2 = seen.toArray(Array.empty[PhaseStatus])

      val p1 = afterRun2.filter(_.phase == 1).maxBy(_.updated_at.getTime)
      // counter CONTINUED from the checkpointed 1 -> 2, not restarted
      assert(p1.tool_count == 2, s"tool_count ${p1.tool_count}, expected 2")
      assert(p1.status == "completed")
      // the claim (started_at) survived the restart unchanged
      assert(p1.started_at == ts("2026-01-01 10:00:00"))
      assert(p1.completed_at.contains(ts("2026-01-01 10:06:00")))
      // the stall timer registered before the kill fired after it
      val p2Statuses = afterRun2.filter(_.phase == 2).map(_.status).toSet
      assert(p2Statuses.contains("stalled"), s"phase2 post-restart: $p2Statuses")
    }
  }

  test("transformWithState machine agrees with the fMGWS machine incl. stall timer") {
    // transformWithState requires the RocksDB state store
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ToolEvent]
    val out = LifecycleV2.statusStream(mem.toDS(), watermarkDelay = "0 seconds")
    val q = out.writeStream.format("memory").queryName("lifecycle2_out")
      .outputMode("update").start()
    try {
      mem.addData(
        ToolEvent("p", 1, "proj", "Session", None, "start", ts("2026-01-01 10:00:00")),
        ToolEvent("p", 1, "proj", "Edit", Some("a.ts"), "tool", ts("2026-01-01 10:01:00")),
        ToolEvent("p", 2, "proj", "Session", None, "start", ts("2026-01-01 10:00:30")))
      q.processAllAvailable()
      mem.addData(
        ToolEvent("p", 1, "proj", "", None, "stop_completed", ts("2026-01-01 10:03:00")),
        // steal attempt on a terminal phase must be absorbed
        ToolEvent("p", 1, "proj", "Bash", None, "tool", ts("2026-01-01 10:04:00")))
      q.processAllAvailable()
      // push the watermark past phase 2's stall deadline, then one more
      // batch so the timer fires
      mem.addData(ToolEvent("p", 3, "proj", "Session", None, "start", ts("2026-01-01 10:30:00")))
      q.processAllAvailable()
      mem.addData(ToolEvent("p", 3, "proj", "Bash", None, "tool", ts("2026-01-01 10:31:00")))
      q.processAllAvailable()

      val rows = spark.table("lifecycle2_out")
      val p1 = rows.filter($"phase" === 1).orderBy($"updated_at".desc).limit(1).collect().head
      assert(p1.getAs[String]("status") == "completed")
      assert(p1.getAs[Int]("tool_count") == 1)
      val p2Statuses = rows.filter($"phase" === 2).select("status")
        .collect().map(_.getString(0)).toSet
      assert(p2Statuses.contains("stalled"), s"phase2 statuses: $p2Statuses")
    } finally {
      q.stop()
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transitionPairs V2 (transformWithState) agrees with the fMGWS form") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      import graft.streaming.{Streams, TransitionsV2}
      import Streams.TransEvent
      def feed(counts: org.apache.spark.sql.Dataset[TransEvent] =>
          org.apache.spark.sql.DataFrame, name: String): Map[(String, String), Long] = {
        val mem = MemoryStream[TransEvent]
        val q = counts(mem.toDS()).writeStream.format("memory")
          .queryName(name).outputMode("complete").start()
        try {
          def e(id: Long, u: Long, t: String, time: String) =
            TransEvent(u, id, ts(time), t)
          // same scenario as the fMGWS StreamingSpec test: chains, a
          // session break, a cross-batch continuation — plus an
          // out-of-order late arrival that must be inert
          mem.addData(
            e(1, 1, "view", "2026-01-01 10:00:00"),
            e(2, 1, "click", "2026-01-01 10:10:00"),
            e(3, 1, "purchase", "2026-01-01 10:20:00"),
            e(4, 2, "view", "2026-01-01 10:00:00"))
          q.processAllAvailable()
          mem.addData(
            e(5, 1, "view", "2026-01-01 11:25:00"),   // 65-min gap: break
            e(6, 1, "click", "2026-01-01 11:30:00"),
            e(7, 2, "click", "2026-01-01 10:25:00"),  // cross-batch chain
            e(8, 2, "purchase", "2026-01-01 09:55:00")) // LATE (older than
              // the remembered 10:00 state): must be inert
          q.processAllAvailable()
          spark.table(name).collect()
            .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
        } finally q.stop()
      }
      val v1 = feed(Streams.transitionCounts(_), "trans_v1_cmp")
      val v2 = feed(TransitionsV2.transitionCounts(_), "trans_v2_cmp")
      assert(v1 == v2, s"fMGWS $v1 vs transformWithState $v2")
      assert(v2 == Map(("view", "click") -> 3L, ("click", "purchase") -> 1L),
        s"expected counts: $v2")
    }
  }
}
