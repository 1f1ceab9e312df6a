package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement harness (guide §1/§7): runs the named
  * queries through the same noop-sink methodology as Bench, with a
  * stage-level listener in place of the (disabled) UI — per stage it
  * prints wall time, task count, input/shuffle-read/shuffle-write bytes
  * and records, so shuffle-bound vs compute-bound vs overhead-bound is
  * readable per query without event-log spelunking.
  *
  * Usage: sbt "runMain graft.Profile q242_probe_eval q238_quality_probe"
  * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32),
  *      SPARK_GRAFT_PROFILE_REPS (default 2 — rep 1 warms JIT/codegen,
  *      the LAST rep's stages are printed).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.get("SPARK_GRAFT_PROFILE_REPS").map(_.toInt).getOrElse(2)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64L * 1024 * 1024}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class StageRow(jobId: Int, stageId: Int, name: String,
      ms: Long, tasks: Int, inputMb: Double, srMb: Double, swMb: Double,
      outRecords: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[StageRow]()
    val jobOfStage = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        js.stageIds.foreach(sid => jobOfStage.put(sid, js.jobId))
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        val ms = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
        stages.add(StageRow(
          jobOfStage.getOrDefault(si.stageId, -1), si.stageId,
          si.name.takeWhile(_ != '\n'), ms, si.numTasks,
          m.inputMetrics.bytesRead / 1e6,
          m.shuffleReadMetrics.remoteBytesRead / 1e6 + m.shuffleReadMetrics.localBytesRead / 1e6,
          m.shuffleWriteMetrics.bytesWritten / 1e6,
          m.outputMetrics.recordsWritten))
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val names = if (args.nonEmpty) args.toSeq else Seq("q02_topk_revenue")
    names.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(s"unknown query $name")
        case Some(fn) =>
          var lastDt = 0.0
          for (r <- 1 to reps) {
            stages.clear()
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop").mode("overwrite").save()
            lastDt = (System.nanoTime() - t0) / 1e9
            Ckpt.sweep(spark)
            println(f"== $name rep $r: $lastDt%.3f s")
          }
          import scala.jdk.CollectionConverters._
          val rows = stages.asScala.toVector.sortBy(s => (s.jobId, s.stageId))
          val nJobs = rows.map(_.jobId).distinct.size
          println(f"-- $name last-rep stages=${rows.size} jobs=$nJobs sumStageMs=${rows.map(_.ms).sum}")
          rows.foreach { s =>
            println(f"   job=${s.jobId}%3d stage=${s.stageId}%4d ${s.ms}%6d ms tasks=${s.tasks}%3d " +
              f"in=${s.inputMb}%7.2fMB sr=${s.srMb}%7.2fMB sw=${s.swMb}%7.2fMB ${s.name}")
          }
      }
    }
    spark.stop()
  }
}
