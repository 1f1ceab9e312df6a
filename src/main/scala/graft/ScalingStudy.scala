package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Scaling-study runner (PERF.md §10×/§100×): times the named queries
  * on each given dataset dir — warmup pass then one timed pass, the
  * same `noop` materialization discipline as [[Bench]] — and prints one
  * STUDY line per (dir, query) carrying the runtime AND every
  * `graft_*` observed metric the timed run emitted. The metrics are
  * the point: a width-capped LSH run that looks sublinear is only
  * honest if the dropped-bucket/row/pair counters are printed next to
  * the time, so "the cap held the candidate mass" and "the cap
  * silently ate the workload" are distinguishable from the record
  * (`llm.DropMetrics` rides the runs via `observe`; Bench's WARN log
  * level swallows its listener's INFO lines, so this runner collects
  * `observedMetrics` directly).
  *
  * Usage: `runMain graft.ScalingStudy <dir1,dir2,...> <qprefix1,...>`
  * (env `SPARK_GRAFT_CPUS` as in Bench). Deliberately NOT a bench
  * record writer — nothing here stamps BENCH_* files.
  */
object ScalingStudy {
  def main(args: Array[String]): Unit = {
    require(args.length == 2,
      "usage: ScalingStudy <dir1,dir2,...> <queryPrefix1,...>")
    val dirs = args(0).split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    val prefixes = args(1).split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold",
        sys.env.getOrElse("SPARK_GRAFT_BROADCAST", s"${64L * 1024 * 1024}"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val metrics = scala.collection.concurrent.TrieMap.empty[String, String]
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit = {
        if (sys.env.contains("SPARK_GRAFT_STUDY_DEBUG")) {
          val id = java.lang.System.identityHashCode(qe)
          java.nio.file.Files.write(java.nio.file.Paths.get(s"/tmp/plan_$id.txt"),
            qe.executedPlan.toString.getBytes("UTF-8"))
          System.err.println(s"DBG f=$f builtin=${qe.observedMetrics} shim=${
            org.apache.spark.sql.graftshim.GraftSqlShim
              .collectObservedMetrics(qe.executedPlan)} plan=/tmp/plan_$id.txt")
        }
        org.apache.spark.sql.graftshim.GraftSqlShim
          .collectObservedMetrics(qe.executedPlan)
          .foreach { case (n, r) =>
            if (n.startsWith("graft_")) metrics.put(n, r.toString)
          }
      }
      override def onFailure(f: String, qe: QueryExecution, e: Exception): Unit = ()
    })
    val qs = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
    require(qs.nonEmpty, s"no query matches ${prefixes.mkString(",")}")
    // a (dir, query) that throws must not abort the rest of the study —
    // a multi-dir run losing all later points to one bad decade is the
    // Bench-failure-marker lesson replayed here; the session stop rides
    // a finally so an unexpected error cannot leak the JVM's executors
    try {
      for (dir <- dirs; (name, fn) <- qs) {
        def pass(): Double = {
          val t0 = System.nanoTime()
          fn(spark, dir).write.format("noop").mode("overwrite").save()
          val dt = (System.nanoTime() - t0) / 1e9
          Ckpt.sweep(spark)
          dt
        }
        try {
          pass() // warmup: listing + codegen + JIT
          // QueryExecutionListener callbacks fire asynchronously on a
          // separate thread; the drain below waits for quiescence before
          // the counters are read, and clearing here keeps a slow warmup
          // callback from bleeding into the timed run's metric set
          org.apache.spark.sql.graftshim.GraftSqlShim.drainListenerBus(spark)
          metrics.clear()
          val dt = pass()
          org.apache.spark.sql.graftshim.GraftSqlShim.drainListenerBus(spark)
          val kv = metrics.toSeq.sortBy(_._1)
            .map { case (k, v) => s"$k=$v" }.mkString(" ")
          println(f"STUDY dir=$dir query=$name sec=$dt%.2f $kv")
        } catch {
          case t: Throwable =>
            System.err.println(
              s"STUDY-FAILED dir=$dir query=$name: ${t.getClass.getName}: ${t.getMessage}")
            t.getStackTrace.take(5).foreach(f => System.err.println(s"  at $f"))
        }
      }
    } finally spark.stop()
  }
}
