package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal columns for the training-data pipeline (north star):
  * image/audio/video as opaque `binary` columns with typed metadata,
  * plus decode / feature-extract / resize / frame-sample operators.
  *
  * The actual codec call is STUBBED (this container has no image/audio
  * libraries): `FakeCodec` derives deterministic "pixels" from the
  * payload bytes. Everything around the stub — the media schema, the
  * `mapPartitions` batch shape (decoder state amortized per partition,
  * exactly how a JNI/FFI codec would be held), the feature-vector
  * output feeding `Similarity`, and the metadata transforms — is real
  * Spark plumbing and is tested.
  *
  * Scale: payloads stay opaque bytes end-to-end (no driver collect, no
  * string conversion); per-partition decoding keeps codec init off the
  * per-row path; features are fixed-width arrays so downstream ANN
  * (Similarity.q39) shuffles small vectors, never raw media.
  */
object Multimodal {

  case class MediaRow(
      media_id: Long,
      kind: String,          // image | audio | video
      content: Array[Byte],  // opaque payload
      width: Int, height: Int,
      sample_rate: Int, duration_ms: Long, format: String)

  case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Int,
      features: Seq[Double]) // FeatureDim-bin normalized byte histogram

  val FeatureDim = 16

  /** STUB — deterministic stand-in for the real decoder. A production
    * build replaces this object with an FFI codec (libjpeg/ffmpeg …)
    * initialized once per partition; the call signature (bytes in,
    * fixed-width features out) and determinism contract are the real
    * interface. */
  object FakeCodec {
    /** "Decode" = normalized 16-bin histogram of payload bytes. */
    def features(bytes: Array[Byte]): Array[Double] = {
      val hist = new Array[Double](FeatureDim)
      var i = 0
      while (i < bytes.length) {
        hist((bytes(i) & 0xFF) * FeatureDim / 256) += 1.0
        i += 1
      }
      val n = math.max(bytes.length, 1).toDouble
      hist.map(_ / n)
    }

    /** "Resize" = metadata-only transform (a real codec would re-encode;
      * the engine-side contract — new dims, same id — is identical). */
    def resize(r: MediaRow, w: Int, h: Int): MediaRow =
      r.copy(width = w, height = h)
  }

  /** Build a deterministic media table from the documents corpus: the
    * text bytes are the opaque payload (varying, reproducible), kind
    * cycles image/audio/video, metadata derived from n_chars. */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRow] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id".as("media_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod($"doc_id", lit(3)) + 1).cast("int")).as("kind"),
        $"text".cast("binary").as("content"),
        (pmod($"doc_id", lit(640)) + 16).cast("int").as("width"),
        (pmod($"doc_id", lit(480)) + 16).cast("int").as("height"),
        lit(16000).as("sample_rate"),
        ($"n_chars" * 40).as("duration_ms"),
        lit("fake/v1").as("format"))
      .as[MediaRow]
  }

  /** Decode + feature-extract via mapPartitions: the decoder is touched
    * once per partition (amortized init), rows stream through in one
    * pass. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val s = media.sparkSession
    import s.implicits._
    media.mapPartitions { it =>
      // per-partition decoder handle would be created HERE in a real codec
      val codec = FakeCodec
      it.map { r =>
        // a NULL payload (e.g. a null text column cast to binary) is
        // empty media, not a per-row NPE in the executor
        val bytes = if (r.content == null) Array.emptyByteArray else r.content
        MediaFeatures(r.media_id, r.kind, bytes.length,
          codec.features(bytes).toSeq)
      }
    }
  }

  /** Frame sampling for video rows: one output row per sampled frame at
    * `fps`-spaced timestamps — pure relational explode on metadata, no
    * payload duplication (each frame row carries only the offset; a real
    * pipeline decodes lazily from the shared payload). */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long = 1000L): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    media.toDF()
      .filter($"kind" === "video")
      .withColumn("frame_ms",
        explode(sequence(lit(0L), greatest($"duration_ms" - 1, lit(0L)), lit(everyMs))))
      .select($"media_id", $"frame_ms", $"width", $"height")
  }

  /** q52: media feature extraction over the derived corpus. The corpus
    * payloads are ASCII text bytes, which makes even the codec stub's
    * output SQL-expressible — so q52 is DIRECTLY hash-graded (round 6),
    * not rows-only: the oracle recomputes the byte histogram per doc in
    * DuckDB (ord() per position == UTF-8 byte for ASCII). `f6` (bytes
    * 96–111, the a–o lowercase range) varies per document and carries
    * the grading signal; `feat_sum`/`f0` pin normalization and the
    * empty-bin path. A real binary corpus loses the oracle but keeps
    * MultimodalSpec's determinism/normalization invariants. */
  def q52MediaFeatures(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    extractFeatures(mediaTable(s, dir)).toDF()
      .select($"media_id", $"kind", $"n_bytes",
        round(aggregate($"features", lit(0.0), (a, x) => a + x), 6).as("feat_sum"),
        round(element_at($"features", 1), 6).as("f0"),
        round(element_at($"features", 7), 6).as("f6"))
      .orderBy($"media_id")
  }

  /** q52 oracle: byte histogram restated over `documents`. Bins with no
    * bytes are absent from the grouped rows; `+0.0` is the identity for
    * the non-negative bin values, so `list_sum` over the present bins in
    * bin order equals Spark's 16-element left fold bit-for-bit.
    * Byte-exact, not char-exact: n and the bins come from the UTF-8
    * encoding (`octet_length(encode(..))` + hex-pair extraction), the
    * same bytes Spark's `cast(text AS binary)` feeds the codec — a
    * `length(text)`/`ord()` restatement would diverge on the first
    * multi-byte character. */
  val q52Sql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
      |    hex(encode(text)) AS hx, octet_length(encode(text)) AS n
      |  FROM documents),
      |pos AS (SELECT media_id, hx, n,
      |          unnest(generate_series(1, CAST(n AS INT))) AS i FROM m),
      |bins AS (
      |  SELECT media_id, bin, CAST(count(*) AS DOUBLE) / any_value(n) AS v
      |  FROM (SELECT media_id,
      |          ('0x' || substr(hx, 2 * CAST(i AS INT) - 1, 2))::INT // 16 AS bin, n
      |        FROM pos) b
      |  GROUP BY media_id, bin),
      |h AS (
      |  SELECT media_id,
      |    round(list_sum(list(v ORDER BY bin)), 6) AS feat_sum,
      |    round(coalesce(max(CASE WHEN bin = 0 THEN v END), 0.0), 6) AS f0,
      |    round(coalesce(max(CASE WHEN bin = 6 THEN v END), 0.0), 6) AS f6
      |  FROM bins GROUP BY media_id)
      |SELECT m.media_id, m.kind, CAST(m.n AS INT) AS n_bytes,
      |  coalesce(h.feat_sum, 0.0) AS feat_sum,
      |  coalesce(h.f0, 0.0) AS f0, coalesce(h.f6, 0.0) AS f6
      |FROM m LEFT JOIN h USING (media_id) ORDER BY m.media_id""".stripMargin

  /** Frames-per-video accounting shared by q53 and q112 — one
    * definition so the two graded shapes cannot silently diverge from
    * their common oracle arithmetic. */
  private def frameStats(media: Dataset[MediaRow]): DataFrame = {
    val s = media.sparkSession
    import s.implicits._
    sampleFrames(media)
      .groupBy($"media_id")
      .agg(count(lit(1)).as("n_frames"), max($"frame_ms").as("last_frame_ms"))
  }

  /** q53: frame sampling — frames per video at 1 fps equivalent. */
  def q53FrameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    frameStats(mediaTable(s, dir)).orderBy($"media_id")
  }

  /** q112: the deterministic multimodal path, oracle-graded — everything
    * around the codec stub: the media-table derivation (kind cycle,
    * width/height/duration metadata), payload byte length, and the
    * frame-selection arithmetic, restated in DuckDB over `documents`.
    * Only `FakeCodec.features` (the histogram that a real decoder
    * replaces) stays outside the oracle; its plumbing columns
    * (media_id, kind, n_bytes) are exactly the ones graded here, so a
    * regression in the q52/q53 shape can no longer hide behind the
    * rows-only check. Reference analogue: the nested report type in
    * `agents/output-processor.md:35-61`. */
  def q112MediaMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // one mediaTable instance feeds both branches. The physical plan
    // still scans twice (the branches share no exchange, so Catalyst
    // has nothing to ReusedExchange) — deliberate, same trade as q117:
    // both scans are column-pruned and a second columnar read beats
    // persisting a corpus-sized derived table at 100 TB.
    val mt = mediaTable(s, dir)
    val m = mt.toDF()
    val frames = frameStats(mt)
    m.select($"media_id", $"kind", $"width", $"height", $"sample_rate",
        $"duration_ms", $"format", length($"content").as("n_bytes"))
      .join(frames, Seq("media_id"), "left")
      .select($"media_id", $"kind", $"width", $"height", $"sample_rate",
        $"duration_ms", $"format", $"n_bytes",
        coalesce($"n_frames", lit(0L)).as("n_frames"), $"last_frame_ms")
      .orderBy($"media_id")
  }

  val q112Sql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
      |    CAST((doc_id % 640) + 16 AS INT) AS width,
      |    CAST((doc_id % 480) + 16 AS INT) AS height,
      |    CAST(16000 AS INT) AS sample_rate,
      |    n_chars * 40 AS duration_ms,
      |    'fake/v1' AS format,
      |    CAST(octet_length(encode(text)) AS INT) AS n_bytes
      |  FROM documents),
      |f AS (
      |  SELECT media_id, count(*) AS n_frames, max(frame_ms) AS last_frame_ms
      |  FROM (SELECT media_id,
      |          unnest(generate_series(0, greatest(duration_ms - 1, 0), 1000)) AS frame_ms
      |        FROM m WHERE kind = 'video') t
      |  GROUP BY media_id)
      |SELECT m.media_id, m.kind, m.width, m.height, m.sample_rate,
      |  m.duration_ms, m.format, m.n_bytes,
      |  coalesce(f.n_frames, 0) AS n_frames, f.last_frame_ms
      |FROM m LEFT JOIN f USING (media_id) ORDER BY m.media_id""".stripMargin

  /** q53's own oracle: frame sampling is pure metadata arithmetic
    * (sequence over duration_ms) — directly SQL-expressible. */
  val q53Sql: String =
    """WITH m AS (
      |  SELECT doc_id AS media_id,
      |    (['image','audio','video'])[CAST(doc_id % 3 AS INT) + 1] AS kind,
      |    n_chars * 40 AS duration_ms
      |  FROM documents)
      |SELECT media_id, count(*) AS n_frames, max(frame_ms) AS last_frame_ms
      |FROM (SELECT media_id,
      |        unnest(generate_series(0, greatest(duration_ms - 1, 0), 1000)) AS frame_ms
      |      FROM m WHERE kind = 'video') t
      |GROUP BY media_id ORDER BY media_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q52_media_features" -> (q52MediaFeatures _),
    "q53_frame_sample"   -> (q53FrameSample _),
    "q112_media_meta"    -> (q112MediaMeta _),
  )

  val oracle: Map[String, String] = Map(
    "q52_media_features" -> q52Sql,
    "q53_frame_sample"   -> q53Sql,
    "q112_media_meta"    -> q112Sql,
  )
}
