package graft.sources

import org.apache.spark.sql.DataFrame

/** Writer-side layout control — the sink half of the 100 TB story.
  * Reading at scale is only as good as how the data was written:
  * thousands of tiny files drown the scheduler and the object store;
  * one giant file serializes the next job's parallelism; an
  * unpartitioned layout forces full scans where a `lang=en/` directory
  * would have pruned 95% of the bytes.
  *
  * (Bucketed-table writes — the third layout tool, for exchange-free
  * joins — go through `saveAsTable` and are exercised in ScaleSpec.)
  */
object Sink {

  /** Parquet write with a target row count per output file.
    * `repartition(n)` sets the write parallelism to the intended file
    * count; `maxRecordsPerFile` additionally caps any skewed task so a
    * hot partition cannot produce a monster file. Costs one extra job
    * for the `count()` — at scale, pass a known/estimated count via
    * `rows` instead. Returns the planned file count. */
  def writeSized(df: DataFrame, path: String, rowsPerFile: Long,
      rows: Option[Long] = None): Long = {
    require(rowsPerFile > 0, "rowsPerFile must be positive")
    val n = rows.getOrElse(df.count())
    val nFiles = math.max(1L, (n + rowsPerFile - 1) / rowsPerFile)
    // repartition takes an Int: a file count past Int.MaxValue would
    // silently wrap negative — error with guidance instead (a layout
    // that needs billions of files wants partitionBy, not one flat dir)
    require(nFiles <= Int.MaxValue,
      s"writeSized: $n rows at $rowsPerFile rows/file needs $nFiles files " +
        "(> Int.MaxValue) — raise rowsPerFile or use writePartitioned")
    df.repartition(nFiles.toInt)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", rowsPerFile)
      .parquet(path)
    nFiles
  }

  /** Hive-style partitioned layout (`col=value/` directories): readers
    * filtering on a partition column scan only matching directories —
    * partition pruning, the cheapest predicate pushdown there is. */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(cols: _*).parquet(path)
}
