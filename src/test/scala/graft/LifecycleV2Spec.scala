package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.model.ToolEvent
import graft.streaming.LifecycleV2

class LifecycleV2Spec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

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
}
