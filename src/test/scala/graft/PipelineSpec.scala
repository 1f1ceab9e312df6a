package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

class PipelineSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  test("curation pipeline: survivors are unique by fingerprint, long enough, and present in source") {
    val out = llm.Pipeline.curate(spark, sf)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // exact-dedup stage: one survivor per fingerprint
    assert(out.select("fp").distinct().count() == rows.length)
    // quality gate held
    assert(rows.forall(_.getAs[Int]("n_tokens") >= 20))
    // provenance ids are genuine doc ids
    val ids = Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => ids.contains(r.getLong(0))))
    // the funnel removed something (near-dups/quality/lang all active)
    assert(rows.length < ids.size)
  }

  test("dropDuplicatesWithinWatermark dedups within the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, Long, String)]
    val events = mem.toDS().toDF("ts", "user_id", "event_type")
    val q = streaming.Streams.dedupWithinWatermark(events, "10 minutes")
      .writeStream.format("memory").queryName("wmdedup_out")
      .outputMode("append").start()
    try {
      mem.addData(
        (Timestamp.valueOf("2026-01-01 10:00:00"), 1L, "click"),
        (Timestamp.valueOf("2026-01-01 10:01:00"), 1L, "click"), // dup within horizon
        (Timestamp.valueOf("2026-01-01 10:02:00"), 2L, "click"))
      q.processAllAvailable()
      assert(spark.table("wmdedup_out").count() == 2)
    } finally q.stop()
  }
}
