package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-hygiene regression guard: no registered query may plan a
  * cartesian product (except the whitelisted intentional crosses over
  * tiny dimensions), and the big-fact scans must prune columns — the
  * properties that keep every query viable at 100 TB. */
class PlanHygieneSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  /** Intentional tiny-dimension crosses / scalar-subquery broadcasts. */
  private val cartesianOk = Set(
    "q25_stall_detect",    // broadcast of a 1-row high-water mark
    "q36_cosine_topk",     // brute-force by design: broadcast Q vs corpus
    "q63_levenshtein",     // 25x25 nation pairs
    "q65_cross_join",      // region x status grid
    "q66_ann_ivf",         // broadcast of ~16 centroids
    "q132_ann_ivf2",       // broadcast of ~sqrt(K) supers + per-super cents
                           // — the hierarchical IVF fan-outs ARE the algorithm
    "q134_ivf_increment",  // broadcast of the store's centroids over the
                           // ingest batch — the one-pass assignment IS the op
    "q135_bloom_incremental", // broadcast of the 1-row Bloom bitset
    "q136_ann_sq8",        // broadcast 1-row extents + broadcast Q vs
                           // quantized corpus (q36's shape, 8-bit codes)
    "q138_ann_pq",         // broadcast of the 1-row codebook stride
    "q140_pagerank",       // broadcast of the 1-row node count
    "q213_equidepth_sketch", // broadcast of the 1-row sketch boundaries
                           // (9 values) — the q139 scalar-graft pattern
    "q227_calibration_sketch", // same 1-row sketch-boundary broadcast
                           // (q222's production twin)
    "q219_ks_split_drift", // broadcast of the 1-row split totals over
                           // the bounded per-length census
    "q146_skew_report",    // broadcast of the 1-row grand total
    "q137_zorder_layout",  // broadcast of the 1-row min/max extent
    "q79_scalar_subquery", // broadcast of a 1-row global average
    "q117_tfidf_terms",    // broadcast of the 1-row corpus doc count
    "q118_mixture_rebalance", // broadcast of the 1-row min source size
    "q125_cosine_sql",     // pre-bounded 50-row all-pairs self-join (q36's
                           // brute-force shape through the SQL front door)
    "q157_bm25",           // broadcast of the 1-row N/avgdl scalars (q117's
                           // corpus-count pattern)
    "q159_hybrid_rrf",     // same BM25 scalar graft + broadcast 1-row probe
                           // vector vs candidates (q36's brute-force shape)
    "q182_bpe_merges",     // broadcast of the 1-row chosen merge pair (the
                           // q117 scalar-graft pattern, applied per round)
    "q185_knn_label",      // broadcast 10-row probe set vs candidates (q36's
                           // brute-force shape; ANN paths are the scale path)
    "q190_knn_confusion",  // same geometry, 100-row probe set
    "q191_relational_division", // broadcast of the 1-row priority-class count
    "q193_bpe_encode",     // broadcast 1-row learned-merge grafts (q182's
                           // pattern, applied in the encode pass too)
    // q198_cosine_threshold_sweep: DELIBERATELY NOT LISTED — the r11
    // rewrite (single conditional aggregation + stack) removed its
    // scalar-graft crossJoins, so the no-cartesian check covers it again
    "q207_pps_sample",     // broadcast 5-row threshold probe vs cumulative
                           // ranges (deliberate range condition, no keys)
    "q208_apportionment",  // broadcast 1-row total + 1-row leftover grafts
    "q226_neyman_allocation", // same two 1-row grafts as q208
    "q229_semantic_dedup", // q66's broadcast-centroid assignment pass —
                           // the one N×K fan-out IS the SemDeDup build
    "q231_hard_negatives", // broadcast 10-row query set vs corpus (q36's
                           // graded brute-force shape, q185's geometry)
    "q233_semdedup_increment", // q134's broadcast-centroid assignment
                           // passes (store reps + ingest batch) — the
                           // N×K fan-out IS the incremental build
    "q240_semdedup_batch", // the SAME broadcast-centroid assignment as
                           // q233's batch half, against the committed
                           // K-row index fixture — batch×K fan-out IS
                           // the batch-only assignment being graded
    "q250_semindex_compaction", // the compaction rebuild: q240's batch
                           // assignment vs the fixture index + q233's
                           // broadcast-centroid passes over the grown
                           // store — every fan-out IS the graded build
    "q254_semindex_compact2", // the two-level rebuild: same broadcast
                           // fan-outs, but vs G ≈ √K supers then the
                           // within-super centroids (~2N·N^0.25 total)
    "q234_hard_negatives_ivf", // broadcast per-label centroid tables:
                           // the Lloyd/assignment fan-outs (q66's shape,
                           // label-keyed) + the Q×ΣK probe ranking
    "q235_dsir_select",    // broadcast of the 1-row ΣA/ΣBv corpus
                           // totals (the q117 scalar-graft pattern)
    "q236_unimax_mixing",  // broadcast 1-row budget + 1-row fill-state
                           // grafts over the #languages-row frame
                           // (q208's two-scalar-graft shape)
    "q237_kcenter_coreset", // per-round broadcast of the 1-row current
                           // center (q182's per-round scalar graft)
    "q238_quality_probe",  // per-step broadcast of the 1-row exact doc
                           // count into the mean-gradient update
    "q265_ann_recall",     // q36's broadcast 10-row query fan-out + q66's
                           // centroid assignment pass — the two builds
                           // whose recall gap IS the measurement; the
                           // scoring join itself is an equi-join
    "q267_ann_nprobe_sweep", // q265's two builds plus the deliberate
                           // 5-row nprobe VALUES crossJoin that derives
                           // the sweep points from ONE build
    "q268_ann_family_recall", // the four family builds each carry their
                           // own allowlisted fan-out (q132/q136/q138
                           // shapes) + q36's broadcast baseline
    "q269_ann_recall_sampled", // q66's assignment pass + the broadcast
                           // 5-query fan-out over the ≈512-vector
                           // sample — the bounded brute side IS the
                           // scale fix being graded
    "q273_pq_rerank_sweep", // q138's build + q36's broadcast baseline
                           // plus the deliberate 5-row rerank-depth
                           // VALUES crossJoin that derives the sweep
                           // points from ONE build (q267's pattern on
                           // the rerank knob)
    "q277_ann_ivfpq",      // q66's broadcast-centroid assignment pass
                           // (the one N×K fan-out) + the broadcast
                           // codebook/query-slice joins of the PQ
                           // scoring — the IVFPQ composition's own
                           // graded builds
    "q278_ivfpq_recall",   // q36's broadcast baseline + q277's build —
                           // the two sides whose gap IS the measurement
                           // (q265's shape); the scoring join is an
                           // equi-join
    "q279_seq_shuffle_plan", // the deliberate 3-row epoch VALUES
                           // crossJoin over the sequence inventory —
                           // one inventory, every epoch's plan
                           // (q267's one-build-many-points shape)
    "q280_funnel_mixture") // q236's broadcast 1-row budget + 1-row
                           // fill-state grafts over the #sources-row
                           // frame — the shared allocator's shape

  test("no unintended cartesian products across the whole catalog") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan =
        try fn(spark, sf).queryExecution.executedPlan.toString
        catch { case e: Throwable => fail(s"$name failed to plan: ${e.getMessage}") }
      if ((plan.contains("CartesianProduct") || plan.contains("BroadcastNestedLoopJoin"))
          && !cartesianOk.contains(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"queries planning cartesian/nested-loop joins: $offenders")
  }

  test("lineitem scans prune columns (never read the full 11-column schema)") {
    val wide = Seq("q01_agg", "q02_topk_revenue", "q03_join_brand", "q18_having")
    wide.foreach { name =>
      val scans = SparkEntry.queries(name)(spark, sf)
        .queryExecution.sparkPlan.collect {
          case f: org.apache.spark.sql.execution.FileSourceScanExec =>
            f.requiredSchema.fields.length
        }
      assert(scans.nonEmpty, s"$name: no parquet scan found")
      scans.foreach { n =>
        assert(n <= 6, s"$name has a scan reading $n columns")
      }
    }
  }
}
