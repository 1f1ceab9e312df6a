package graft

import org.apache.spark.sql.SparkSession

/** Driver benchmark: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":"total","value":N,"unit":"sec",
  * "queries":{...},"sf":...}.
  *
  * A warmup pass (file listing + codegen + JIT) runs before timing so
  * per-query numbers measure the query, not first-touch JVM costs. */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64L * 1024 * 1024}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Optional env: comma-separated name prefixes — bench only matching
    // queries (local iteration aid; the driver does not set it).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").toSeq.map(_.trim).filter(_.nonEmpty))
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.exists(n.startsWith)) }
    // Materialize through the built-in `noop` sink, NOT count():
    // under count(1) Catalyst prunes every unreferenced projection
    // (q33's md5 fingerprint would never run) and eliminates final
    // sorts, so narrow per-row queries would be timed as little more
    // than parquet scans. The noop write evaluates every column of
    // every row and discards them — the work the query claims to do
    // is the work the clock sees.
    def run(name: String,
            fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Boolean =
      try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
      catch { case t: Throwable =>
        // keep the bench loop alive, but leave the cause diagnosable:
        // class + message + top frames on stderr next to BENCH FAILED
        System.err.println(s"BENCH ERROR [$name]: ${t.getClass.getName}: ${t.getMessage}")
        t.getStackTrace.take(5).foreach(f => System.err.println(s"  at $f"))
        false
      }
    // warmup: JIT + codegen caches + parquet footers
    qs.foreach { case (name, fn) =>
      run(name, fn)
      Ckpt.sweep(spark) // free per-query blocks; memo caches are pinned
    }
    // Median-of-N timing (default 3). A single-shot clock on a shared
    // single-JVM box records whatever the GC/JIT/page-cache happened to
    // do during that one pass — round 8's record carried four phantom
    // ≥1.5x "regressions" that solo reruns showed were pure noise. The
    // median of three passes discards the one disturbed run while still
    // charging real, repeatable slowness all three times. Reps run
    // back-to-back per query (not pass-by-pass over the catalog) so each
    // query's three samples see the same cache/JIT state.
    val reps = sys.env.get("SPARK_GRAFT_BENCH_REPS").map(_.toInt).getOrElse(3)
      .max(1)
    // Process-wide stop-the-world time so far (ms across all collectors)
    // — the delta over a query's reps is that query's GC bill.
    def gcMillis(): Long = {
      import scala.jdk.CollectionConverters._
      java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
        .asScala.map(b => math.max(b.getCollectionTime, 0L)).sum
    }
    // Per-query rep spread: median-of-3 discards ONE disturbed rep, but
    // sustained catalog-context pressure (GC debt from earlier queries,
    // page-cache churn) hits all reps and the median faithfully reports
    // a number a solo rerun won't reproduce — r9's q34 read 11.7s in the
    // catalog run vs 5.15s solo and needed a judge rerun to adjudicate.
    // Recording min/median/max and the GC bill makes the record
    // self-adjudicating: min-of-reps is the contention-resistant claim
    // the bench-gate compares, and a wide (min,max) spread next to a fat
    // gc entry says "context, not code" from the record alone.
    final case class Spread(med: Double, min: Double, max: Double, gc: Double)
    val results: Seq[(String, Double, Option[Spread])] = qs.map { case (name, fn) =>
      val gc0 = gcMillis()
      // iterate-while-ok instead of a fixed map: one failed rep already
      // decides the query's verdict (-1.0), so further reps only
      // triple the failure cost and stderr noise
      val times = Iterator.continually(()).take(reps).map { _ =>
        val t0 = System.nanoTime()
        val ok = run(name, fn)
        val dt = (System.nanoTime() - t0) / 1e9
        Ckpt.sweep(spark) // outside the timed window
        // a failed query must be visibly failed, not a plausible duration
        if (ok) dt else -1.0
      }.takeWhile(_ >= 0).toSeq
      if (times.length < reps) (name, -1.0, None)
      else {
        val sorted = times.sorted
        // true median: average the two middle samples when reps is even
        // (sorted(n/2) alone is the upper-middle, biased high)
        val med =
          if (sorted.length % 2 == 1) sorted(sorted.length / 2)
          else (sorted(sorted.length / 2 - 1) + sorted(sorted.length / 2)) / 2.0
        val gc = (gcMillis() - gc0) / 1e3
        (name, med, Some(Spread(med, sorted.head, sorted.last, gc)))
      }
    }
    val failed = results.collect { case (k, v, _) if v < 0 => k }
    failed.foreach(n => System.err.println(s"BENCH FAILED: $n"))
    def r3(v: Double): String = "%.3f".formatLocal(java.util.Locale.ROOT, v)
    val qjson = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // sibling "spread" map — the scalar "queries" map above stays exactly
    // what the driver parses; consumers that know about spreads (the
    // bench-gate) prefer them
    val sjson = results.collect { case (k, _, Some(sp)) =>
      "\"" + k + "\":{\"med\":" + r3(sp.med) + ",\"min\":" + r3(sp.min) +
        ",\"max\":" + r3(sp.max) + ",\"gc\":" + r3(sp.gc) + "}"
    }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val fjson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qjson,"spread":$sjson,"failed":$fjson,"sf":"$sfDir"}"""
    println(json)
    // The driver's BENCH_r*.json keeps only a tail of the stdout line, so
    // early-alphabet queries vanish from the per-round record. Persist the
    // complete JSON to a repo file (git-tracked, so each round's commit
    // preserves it), and ALSO round-stamp a copy — BENCH_full_r{N}.json,
    // N = 1 + the highest driver tail present — so a later round's run
    // can't erase this round's full record. status.py prefers the
    // stamped snapshots over the truncated tails.
    def persist(path: String): Unit =
      try java.nio.file.Files.write(
        java.nio.file.Paths.get(path),
        json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      catch { case t: Throwable =>
        System.err.println(s"BENCH WARN: could not write $path: ${t.getMessage}")
      }
    val cwd = sys.props("user.dir")
    val fullPath = sys.env.getOrElse(
      "SPARK_GRAFT_BENCH_OUT",
      java.nio.file.Paths.get(cwd, "BENCH_local_full.json").toString)
    persist(fullPath)
    // Only a CANONICAL complete-catalog run may claim a round snapshot:
    // not a SPARK_GRAFT_ONLY-filtered iteration run, not a redirected
    // (SPARK_GRAFT_BENCH_OUT) run, and not a run against a non-default
    // dataset (e.g. the make_scaled.py 3x study) — any of those stamping
    // BENCH_full_r{N}.json would poison the round's record with numbers
    // that are not the round's sf0.1 catalog timings.
    val canonical = only.isEmpty &&
      sys.env.get("SPARK_GRAFT_BENCH_OUT").isEmpty &&
      sfDir == "/root/testdata/sf0.1"
    if (canonical) {
      val tails = Option(new java.io.File(cwd).list()).getOrElse(Array.empty)
        .flatMap { n =>
          val m = "BENCH_r(\\d+)\\.json".r
          n match { case m(d) => Some(d.toInt); case _ => None }
        }
      val round = if (tails.isEmpty) 1 else tails.max + 1
      persist(java.nio.file.Paths.get(cwd, f"BENCH_full_r$round%02d.json").toString)
    }
    spark.stop()
  }
}
