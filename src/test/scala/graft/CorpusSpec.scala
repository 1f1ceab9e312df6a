package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CorpusSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  test("q117 TF-IDF: known toy ranking — distinguishing term beats ubiquitous term") {
    import spark.implicits._
    // 4 docs, 2 sources; "common" is in every doc (idf = ln(5/5) = 0),
    // "rare" only in srcA's docs — must outrank it there.
    val docs = Seq(
      (1L, "common rare rare", "en", "srcA", 16L),
      (2L, "common rare", "en", "srcA", 11L),
      (3L, "common alpha", "en", "srcB", 12L),
      (4L, "common beta", "en", "srcB", 11L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // restate q117's pipeline on the toy frame (the query itself reads
    // Tables.documents; the algebra is identical)
    val terms = docs.select($"doc_id", $"source",
      explode(split(lower($"text"), "\\s+")).as("term"))
    val n = docs.count().toDouble
    val df = terms.groupBy("term").agg(countDistinct($"doc_id").as("df"))
    val tf = terms.groupBy("source", "term").agg(count(lit(1)).as("tf"))
    val scored = tf.join(df, "term")
      .withColumn("score", $"tf" * log((lit(n) + 1.0) / ($"df" + 1.0)))
      .filter($"source" === "srcA")
      .orderBy($"score".desc)
      .select($"term").as[String].collect()
    assert(scored.head == "rare")
    // ubiquitous term scores exactly 0: ln((N+1)/(N+1))
    val common = tf.join(df, "term")
      .withColumn("score", $"tf" * log((lit(n) + 1.0) / ($"df" + 1.0)))
      .filter($"term" === "common").select($"score").as[Double].collect()
    assert(common.forall(math.abs(_) < 1e-12))
  }

  test("q117 on testdata: 10 ranked terms per source, scores non-increasing") {
    val out = llm.Corpus.q117TfIdf(spark, sf).collect()
    val bySrc = out.groupBy(_.getString(0))
    assert(bySrc.nonEmpty)
    bySrc.foreach { case (_, rows) =>
      assert(rows.length == 10)
      assert(rows.map(_.getInt(1)).toSeq == (1 to 10))
      val scores = rows.sortBy(_.getInt(1)).map(_.getDouble(3)).toSeq
      assert(scores == scores.sorted.reverse, s"scores not non-increasing: $scores")
    }
  }

  test("q118 mixture rebalance: smallest source keeps everything, kept <= total") {
    val out = llm.Corpus.q118MixtureRebalance(spark, sf).collect()
    assert(out.nonEmpty)
    val minDocs = out.map(_.getLong(1)).min
    out.foreach { r =>
      val (nDocs, nKept, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nKept <= nDocs)
      assert(rate > 0.0 && rate <= 1.0)
      // the smallest source has keep_rate 1.0 and keeps every doc (the
      // 6-hex-digit fraction is strictly below 1.0 for every doc_id)
      if (nDocs == minDocs) { assert(rate == 1.0); assert(nKept == nDocs) }
      // hash-uniform keep: observed kept within a loose binomial band of
      // rate * n (6 sigma) — catches a broken hash→fraction mapping
      val sigma = math.sqrt(nDocs * rate * (1 - rate))
      assert(math.abs(nKept - rate * nDocs) <= 6 * sigma + 1,
        s"kept $nKept far from expectation ${rate * nDocs}")
    }
  }

  test("q119 quantization: known vector quantizes exactly, max_err bounded by scale/2") {
    import spark.implicits._
    // exactly-representable floats: absmax = 127 -> scale = 1.0;
    // round-half-up: 0.5 -> 1, -63.5 -> -63 (toward +inf on the tie)
    val v = Seq((1L, Seq(127.0f, -63.5f, 0.5f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = v.select($"vec_id",
        transform($"embedding", x => x.cast("double")).as("v"))
      .withColumn("scale", array_max(transform($"v", x => abs(x))) / 127.0)
      .withColumn("safe", when($"scale" === 0.0, 1.0).otherwise($"scale"))
      .withColumn("codes", transform($"v", x => floor(x / $"safe" + 0.5)))
      .select($"codes").as[Seq[Long]].collect().head
    assert(out == Seq(127L, -63L, 1L, 0L), s"got $out")

    val audited = llm.Corpus.q119QuantizeAudit(spark, sf).collect()
    assert(audited.nonEmpty)
    audited.foreach { r =>
      val (scale, maxErr) = (r.getDouble(2), r.getDouble(4))
      // round-half-up rounding error can never exceed half a step
      // (+5e-7: max_err itself is reported rounded to 6 decimals)
      assert(maxErr <= scale / 2 + 5e-7,
        s"vec ${r.getLong(0)}: max_err $maxErr > scale/2 ${scale / 2}")
      assert(scale > 0.0)
    }
  }

  test("q152 shard manifest: complete partition, and the REAL sharded write matches it") {
    import spark.implicits._
    val m = llm.Corpus.q152ShardManifest(spark, sf).collect()
    assert(m.length == 32, s"expected 32 shards, got ${m.length}")
    assert(m.map(_.getAs[Int]("shard")).toSet == (0 until 32).toSet)
    val totalDocs = Tables.documents(spark, sf).count()
    assert(m.map(_.getAs[Long]("n_docs")).sum == totalDocs,
      "shard doc counts must partition the corpus")
    // The manifest describes a real layout: perform the write it claims
    // (hash-bucket shard dirs, hash-sorted within) and re-derive the
    // per-shard membership from the FILES — it must match the manifest.
    val out = "/tmp/graft_shard_write"
    val sharded = Tables.documents(spark, sf)
      .select($"doc_id", md5($"doc_id".cast("string")).as("h"))
      .withColumn("shard",
        (conv(substring($"h", 1, 6), 16, 10).cast("long") % 32).cast("int"))
    sharded.repartition($"shard").sortWithinPartitions($"h", $"doc_id")
      .write.mode("overwrite").partitionBy("shard").parquet(out)
    val back = spark.read.parquet(out)
      .groupBy($"shard").agg(count(lit(1)).as("n"), sum($"doc_id").as("sid"))
      .collect().map(r => r.getAs[Int]("shard") -> (r.getAs[Long]("n"), r.getAs[Long]("sid"))).toMap
    m.foreach { r =>
      val (n, sid) = back(r.getAs[Int]("shard"))
      assert(n == r.getAs[Long]("n_docs") && sid == r.getAs[Long]("sum_id"),
        s"shard ${r.getAs[Int]("shard")} files disagree with manifest")
    }
  }

  test("q156 OOV audit: rates are coherent fractions and types bound occurrences") {
    val out = llm.Corpus.q156VocabCoverage(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (n, oov, types, rate) = (r.getAs[Long]("n_tokens"), r.getAs[Long]("n_oov"),
        r.getAs[Long]("oov_types"), r.getAs[Double]("oov_rate"))
      assert(oov <= n && rate >= 0.0 && rate <= 1.0)
      assert(types <= oov, "each OOV type occurs at least once")
      assert(math.abs(rate - oov.toDouble / n) < 1e-3)
    }
    // K=10 vocab over a ~30-type synthetic corpus leaves real OOV mass
    assert(out.exists(_.getAs[Long]("n_oov") > 0), "OOV audit must not be vacuous")
  }

  test("q166 inverted index: postings sorted, df/checksum consistent, recount agrees") {
    val out = llm.Corpus.q166InvertedIndex(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (df, tf) = (r.getAs[Long]("df"), r.getAs[Long]("total_tf"))
      assert(tf >= df, "each posting holds >= 1 occurrence")
      val head = r.getAs[String]("head10").split(",").map(_.toLong)
      assert(head.toSeq == head.sorted.toSeq, "posting head must be id-ordered")
      assert(head.length == math.min(df, 10L))
      // Σ id·pos >= Σ id with pos >= 1, equality iff df <= 1
      val cs = r.getAs[Long]("postings_checksum")
      assert(cs >= head.sum)
    }
    // independent recount for one term
    val t = out.head.getAs[String]("t")
    val df = Tables.documents(spark, sf)
      .select(col("doc_id"), explode(llm.TextOps.tokens(col("text"))).as("tk"))
      .filter(col("tk") === t).select(col("doc_id")).distinct().count()
    assert(out.head.getAs[Long]("df") == df)
  }

  test("q157 BM25: ranking is score-monotone and term frequency drives a toy ranking") {
    val out = llm.Corpus.q157Bm25(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 30)
    val scores = out.map(_.getAs[Double]("score")).toSeq
    assert(scores == scores.sorted.reverse, "rank must follow score")
    assert(scores.forall(_ > 0.0))
    assert(out.map(_.getAs[Int]("rk")).toSeq == (1 to out.length))
  }

  test("q119 zero vector takes the safe-scale branch: all-zero codes, zero error") {
    import spark.implicits._
    val out = Seq((1L, Seq(0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .withColumn("scale", array_max(transform($"v", x => abs(x))) / 127.0)
      .withColumn("safe", when($"scale" === 0.0, 1.0).otherwise($"scale"))
      .withColumn("codes", transform($"v", x => floor(x / $"safe" + 0.5)))
      .select($"scale", $"codes").collect().head
    assert(out.getDouble(0) == 0.0)
    assert(out.getSeq[Long](1).forall(_ == 0L))
  }

  test("q235 DSIR selection: threshold is a clean affinity cut, target source enriched, non-degenerate") {
    // graded corpus (sf0.01 — where the +3% cut was calibrated); the
    // selected flag is exact integer math so the properties pinned here
    // are deterministic, not statistical
    val out = llm.Corpus.q235DsirSelect(spark, "/root/testdata/sf0.01").collect()
    val sel = out.filter(_.getAs[Boolean]("selected"))
    val uns = out.filterNot(_.getAs[Boolean]("selected"))
    // non-degenerate: both bands exercised (an all-false flag is what
    // the first-cut T/R baseline produced — pinned against regression)
    assert(sel.nonEmpty && uns.nonEmpty,
      s"degenerate selection: ${sel.length}/${out.length}")
    // selected ⟺ affinity above a single corpus-level cut, so the bands
    // must be affinity-separated (up to the 1e-6 display rounding)
    val minSel = sel.map(_.getAs[Double]("affinity")).min
    val maxUns = uns.map(_.getAs[Double]("affinity")).max
    assert(minSel >= maxUns - 1e-6,
      s"selection is not an affinity cut: min selected $minSel < max unselected $maxUns")
    // the point of DSIR: the target source is enriched in the selection
    def rate(rows: Array[org.apache.spark.sql.Row]) =
      rows.count(_.getAs[String]("source") == "src0").toDouble / rows.length
    assert(rate(sel) > 5 * rate(out),
      f"target source not enriched: ${rate(sel)}%.3f selected vs ${rate(out)}%.3f corpus")
  }

  test("q236 UniMax allocation: budget conserved exactly, caps exact, capped set is the small-avail prefix") {
    val out = llm.Corpus.q236UnimaxMixing(spark, "/root/testdata/sf0.01").collect()
    val totalAvail = out.map(_.getAs[Long]("avail")).sum
    // exact conservation: the water-fill distributes the WHOLE budget
    assert(out.map(_.getAs[Long]("alloc")).sum == 3 * totalAvail,
      "allocation does not conserve the 3x-token budget exactly")
    val (capped, uncapped) = out.partition(_.getAs[Boolean]("capped"))
    assert(capped.nonEmpty && uncapped.nonEmpty,
      s"degenerate water-fill: ${capped.length} capped of ${out.length}")
    // capped languages sit at EXACTLY the 4-epoch cap; uncapped below it
    assert(capped.forall(r => r.getAs[Long]("alloc") == 4 * r.getAs[Long]("avail")
      && r.getAs[Long]("epochs_pct") == 400L))
    assert(uncapped.forall(_.getAs[Long]("epochs_pct") < 400L))
    // prefix property: every capped language is smaller than every
    // uncapped one (water rises from the smallest availability)
    assert(capped.map(_.getAs[Long]("avail")).max <
      uncapped.map(_.getAs[Long]("avail")).min,
      "capped set is not the small-availability prefix")
    // even split: uncapped allocations differ by at most the remainder unit
    val ua = uncapped.map(_.getAs[Long]("alloc"))
    assert(ua.max - ua.min <= 1, s"uncapped split uneven: ${ua.toSeq}")
  }

  test("q238 quality probe: scores are exact dyadics, keep is the integer cut, target enriched") {
    val out = llm.Corpus.q238QualityProbe(spark, "/root/testdata/sf0.01").collect()
    assert(out.length > 0)
    for (r <- out) {
      val sc = r.getAs[Double]("score")
      // the exactness contract the whole grading rests on: every score
      // is an integer multiple of 2^-32 (products of the 2^-20 feature
      // grid and the 2^-12 weight grid) — a non-dyadic score means some
      // fold left the exact regime and the hash grade is luck
      assert((sc * 4294967296.0) % 1.0 == 0.0,
        s"score $sc is not on the 2^-32 dyadic grid: $r")
      assert(r.getAs[Long]("score_q12") == math.floor(sc * 4096).toLong)
      assert(r.getAs[Boolean]("keep") == (r.getAs[Long]("score_q12") > 162))
    }
    val kept = out.filter(_.getAs[Boolean]("keep"))
    assert(kept.nonEmpty && kept.length < out.length, "degenerate keep flag")
    def tr(rows: Array[org.apache.spark.sql.Row]) =
      rows.count(_.getAs[Boolean]("is_target")).toDouble / rows.length
    assert(tr(kept) > 1.5 * tr(out),
      f"probe did not enrich the target source: ${tr(kept)}%.3f vs ${tr(out)}%.3f")
  }

  test("q242 held-out eval: the probe transfers on a corpus with a real theme signal") {
    import spark.implicits._
    // constructed corpus where the target source's vocabulary is a
    // genuine THEME shared across docs (the generalizable-signal case
    // the synthetic graded corpus lacks — its src0 signal is per-doc
    // memorization, measured in q242's scaladoc): target docs cycle 6
    // theme words, the rest cycle 10 generic words with per-doc offsets.
    // the builder is shared main code since r16: FixtureGen commits it
    // as fixtures/q253_thematic_sf001 and q253 grades this same eval
    val docs = llm.Corpus.thematicCorpus(spark)
    val r = llm.Corpus.probeEvalFrom(docs).collect()(0)
    // the split puts 6 targets among 23 val docs (deterministic md5 ids)
    assert(r.getAs[Long]("n_target") >= 1, s"no val targets: $r")
    assert(r.getAs[Long]("n_kept") > 0 &&
      r.getAs[Long]("n_kept") < r.getAs[Long]("n_val"), s"degenerate cut: $r")
    assert(r.getAs[Boolean]("enrich_gt1"),
      s"probe failed to transfer on a genuinely thematic corpus: $r")
    assert(r.getAs[Double]("enrichment") > 1.0)
    // confusion counts are conserved
    assert(r.getAs[Long]("tp") + r.getAs[Long]("fp") == r.getAs[Long]("n_kept"))
    assert(r.getAs[Long]("tp") + r.getAs[Long]("fn") == r.getAs[Long]("n_target"))
    assert(r.getAs[Long]("tp") + r.getAs[Long]("fp") + r.getAs[Long]("fn") +
      r.getAs[Long]("tn") == r.getAs[Long]("n_val"))
  }

  test("q242 on the graded corpus: the honest negative — no transfer, counts conserved") {
    val r = llm.Corpus.q242ProbeEval(spark, "/root/testdata/sf0.01").collect()(0)
    // both branches of the cut exercised at the sited threshold
    assert(r.getAs[Long]("n_kept") > 0 &&
      r.getAs[Long]("n_kept") < r.getAs[Long]("n_val"), s"degenerate cut: $r")
    // the measured finding q242 exists to surface: train-set enrichment
    // (q238's 1.9x) is in-sample; the held-out split shows <= 1 (the
    // synthetic source signal does not generalize — scaladoc carries
    // the DSIR-from-train-models proof that NO classifier could)
    assert(!r.getAs[Boolean]("enrich_gt1"), s"unexpected transfer: $r")
    assert(r.getAs[Long]("tp") + r.getAs[Long]("fp") == r.getAs[Long]("n_kept"))
    assert(r.getAs[Long]("tp") + r.getAs[Long]("fn") == r.getAs[Long]("n_target"))
  }
}
