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

  test("dynamic partition pruning bounds a partitioned fact scan by a dim filter") {
    // The 100 TB mechanism the static-pruning test can't show: the
    // partition values to keep are only known at RUNTIME (they come from
    // a filtered dimension), and Spark must still prune the fact scan —
    // via a dynamicpruning subquery on the partition column — instead of
    // reading every partition and filtering after the join.
    val base = java.nio.file.Files.createTempDirectory("dpp").toString
    val docs = Tables.documents(spark, sf)
    Sink.writePartitioned(docs, s"$base/by_lang", Seq("lang"))
    val fact = spark.read.parquet(s"$base/by_lang")
    // dim: a parquet-backed language-metadata table; `is_major` is only
    // decidable by reading the dim, so the fact has no literal lang
    // predicate to prune statically — the star-schema DPP shape
    docs.groupBy($"lang").agg(count(lit(1)).as("n_docs"))
      .write.mode("overwrite").parquet(s"$base/dim")
    // literal comparison, not a bare boolean column — DPP's selectivity
    // heuristic (isLikelySelective) only fires on comparison/IN/LIKE
    // shapes, and a boolean attribute would be simplified to a bare
    // reference before the pruning rule runs
    val majors = spark.read.parquet(s"$base/dim")
      .filter($"n_docs" >= 10).select($"lang".as("dlang"))
    val j = fact.join(majors, $"lang" === $"dlang")
    val n = j.count()
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"fact scan not dynamically pruned:\n$plan")
    val expected = docs.groupBy($"lang").count()
      .filter($"count" >= 10).agg(sum($"count")).collect().head.getLong(0)
    assert(n == expected, s"expected $expected rows from major langs, got $n")
  }
}
