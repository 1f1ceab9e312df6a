package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.Multimodal

class MultimodalSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  test("media table: opaque binary payload with typed metadata") {
    val m = Multimodal.mediaTable(spark, sf)
    val schema = m.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(schema("content") == "binary")
    assert(m.select("kind").distinct().count() == 3)
    val row = m.head()
    assert(row.content.nonEmpty)
  }

  test("feature extraction: deterministic, normalized, fixed-width") {
    val f1 = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))
      .collect().map(f => f.media_id -> f).toMap
    val f2 = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))
      .collect().map(f => f.media_id -> f).toMap
    assert(f1.keySet == f2.keySet)
    f1.foreach { case (id, f) =>
      assert(f.features.length == Multimodal.FeatureDim)
      assert(math.abs(f.features.sum - 1.0) < 1e-9, s"histogram not normalized for $id")
      assert(f.features == f2(id).features, s"nondeterministic features for $id")
    }
  }

  test("null payload is empty media, not an executor NPE") {
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", null, 16, 16, 16000, 0L, "fake/v1"),
      Multimodal.MediaRow(2L, "image", Array[Byte](1, 2), 16, 16, 16000, 0L, "fake/v1"))
    val out = Multimodal.extractFeatures(spark.createDataset(rows))
      .collect().map(f => f.media_id -> f).toMap
    assert(out(1L).n_bytes == 0)
    assert(out(1L).features.forall(_ == 0.0))
    assert(out(2L).n_bytes == 2)
  }

  test("resize stub keeps id and payload, changes dims only") {
    val r = Multimodal.mediaTable(spark, sf).head()
    val resized = Multimodal.FakeCodec.resize(r, 128, 64)
    assert(resized.media_id == r.media_id)
    assert((resized.width, resized.height) == (128, 64))
    assert(resized.content.sameElements(r.content))
  }

  test("frame sampling: frames only for video, count = duration/step + 1") {
    val frames = Multimodal.q53FrameSample(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val vids = Multimodal.mediaTable(spark, sf)
      .filter($"kind" === "video")
      .select($"media_id", $"duration_ms").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(frames.keySet == vids.keySet)
    frames.foreach { case (id, (n, last)) =>
      val dur = vids(id)
      assert(n == (dur - 1) / 1000 + 1, s"media $id: $n frames for ${dur}ms")
      assert(last <= dur)
    }
  }

  test("q112 twin agrees with q52/q53 on the shared deterministic columns") {
    val meta = Multimodal.q112MediaMeta(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    // n_bytes and kind are the q52 plumbing columns
    Multimodal.q52MediaFeatures(spark, sf).collect().foreach { r =>
      val m = meta(r.getLong(0))
      assert(m.getAs[String]("kind") == r.getAs[String]("kind"))
      assert(m.getAs[Int]("n_bytes") == r.getAs[Int]("n_bytes"))
    }
    // frame arithmetic equals q53 for videos, zero frames otherwise
    val frames = Multimodal.q53FrameSample(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    meta.foreach { case (id, m) =>
      if (m.getAs[String]("kind") == "video") {
        assert((m.getAs[Long]("n_frames"), m.getAs[Long]("last_frame_ms")) == frames(id))
      } else {
        assert(m.getAs[Long]("n_frames") == 0L && m.isNullAt(m.fieldIndex("last_frame_ms")))
      }
    }
  }

  test("features feed similarity: cosine over media vectors runs") {
    import org.apache.spark.sql.functions._
    val feats = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf)).toDF()
      .select($"media_id", $"features")
    val a = feats.select($"media_id".as("id1"), $"features".as("v1")).filter($"id1" < 3)
    val b = feats.select($"media_id".as("id2"), $"features".as("v2"))
    val dot = aggregate(zip_with($"v1", $"v2", (x, y) => x * y), lit(0.0), (s, x) => s + x)
    val sims = a.join(b, $"id1" =!= $"id2").withColumn("sim", dot).collect()
    assert(sims.nonEmpty)
    assert(sims.forall(r => !r.getAs[Double]("sim").isNaN))
  }
}
