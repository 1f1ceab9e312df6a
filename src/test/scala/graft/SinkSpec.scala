package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Sink

class SinkSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  private def parquetFiles(dir: String): Array[java.io.File] = {
    def walk(f: java.io.File): Array[java.io.File] =
      if (f.isDirectory) f.listFiles().flatMap(walk)
      else if (f.getName.endsWith(".parquet")) Array(f)
      else Array.empty
    walk(new java.io.File(dir))
  }

  test("writeSized controls output file count and round-trips") {
    val base = java.nio.file.Files.createTempDirectory("sink").toString
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val planned = Sink.writeSized(docs, s"$base/sized", rowsPerFile = 100)
    assert(planned == (n + 99) / 100)
    val files = parquetFiles(s"$base/sized")
    assert(files.length == planned, s"got ${files.length} files, planned $planned")
    assert(spark.read.parquet(s"$base/sized").count() == n)
  }

  test("writePartitioned produces a pruned layout readers can skip") {
    val base = java.nio.file.Files.createTempDirectory("sinkp").toString
    val docs = Tables.documents(spark, sf)
    Sink.writePartitioned(docs, s"$base/by_lang", Seq("lang"))
    val dirs = new java.io.File(s"$base/by_lang").listFiles()
      .filter(_.isDirectory).map(_.getName).filter(_.startsWith("lang="))
    assert(dirs.nonEmpty)
    // one partition read back = that partition only, via pruning
    val en = spark.read.parquet(s"$base/by_lang").filter($"lang" === "en")
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"partition filter not pushed:\n$plan")
    assert(en.count() == docs.filter($"lang" === "en").count())
  }
}
