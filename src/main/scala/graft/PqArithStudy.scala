package graft

import org.apache.spark.sql.SparkSession

/** One-question study runner (VERDICT r13 item 5): what does q138's
  * oracle-unrollability arithmetic COST? The registered PQ build runs
  * every partial-agg-crossing fold through DECIMAL(18,9) so the DuckDB
  * oracle can restate it bit-for-bit; the production build would use
  * plain doubles (FP order variance is absorbed by the exact rerank —
  * see `Similarity.annPqFrom`'s scaladoc). This times both forms on the
  * given dirs (warmup + median-of-3 per form, interleaved, the Bench
  * discipline) and prints one STUDY line each, so PERF.md can record
  * the measured delta instead of a guess.
  *
  * Usage: `runMain graft.PqArithStudy <dir1,dir2,...>`
  * (env SPARK_GRAFT_CPUS as in Bench). Not a bench-record writer.
  */
object PqArithStudy {
  def main(args: Array[String]): Unit = {
    val dirs = args.headOption.getOrElse("/root/testdata/sf0.1")
      .split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64L * 1024 * 1024}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    def vecsOf(dir: String) = Tables.embeddings(spark, dir)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    def run(dir: String, exact: Boolean): Double = {
      val t0 = System.nanoTime()
      llm.Similarity.annPqFrom(vecsOf(dir), exactDecimal = exact)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (dir <- dirs) {
      Seq(true, false).foreach(run(dir, _)) // warmup both plans
      val samples = (1 to 3).flatMap(_ =>
        Seq(true -> run(dir, true), false -> run(dir, false)))
      for ((label, exact) <- Seq("decimal" -> true, "double" -> false)) {
        val ts = samples.collect { case (`exact`, t) => t }.sorted
        println(f"STUDY q138_pq_$label%s dir=$dir%s med=${ts(1)}%.2f " +
          f"min=${ts.head}%.2f max=${ts.last}%.2f")
      }
    }
    spark.stop()
  }
}
