package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, ExpressionUtils, SparkSession => ClassicSession}

/** Bridge into `private[sql]` constructors the public API no longer
  * exposes after the Spark 4 sql-api split: Column→Expression and
  * LogicalPlan→DataFrame. Lives under `org.apache.spark.sql` for
  * visibility — the standard pattern for third-party plan extensions.
  * Nothing here adds behavior; it only forwards. */
object GraftSqlShim {
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSession], plan)

  /** Test hooks into `private[sql]` extension builders: what a session
    * constructed with these extensions would actually install. */
  def plannerStrategies(e: org.apache.spark.sql.SparkSessionExtensions,
                        spark: SparkSession) =
    e.buildPlannerStrategies(spark)

  def optimizerRules(e: org.apache.spark.sql.SparkSessionExtensions,
                     spark: SparkSession) =
    e.buildOptimizerRules(spark)

  /** A sibling session on `base`'s SparkContext built with the given
    * extensions — what `.withExtensions(...)` would produce if the JVM
    * didn't already hold a default session. Test-only: lets specs
    * exercise the extensions installation path end-to-end (plan through
    * an injected strategy with `experimental` untouched) without
    * tearing down the shared test session. */
  def sessionWithExtensions(base: SparkSession,
                            f: org.apache.spark.sql.SparkSessionExtensions => Unit,
                            options: Map[String, String] = Map.empty): SparkSession = {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    f(ext)
    // the 6-arg primary constructor is Scala-private though public in
    // bytecode — reach it reflectively (same pattern as Ckpt's
    // LogicalRDD.rdd accessor; forwards only, no Spark code copied)
    val ctor = classOf[ClassicSession].getConstructor(
      classOf[org.apache.spark.SparkContext], classOf[Option[_]],
      classOf[Option[_]], classOf[org.apache.spark.sql.SparkSessionExtensions],
      classOf[Map[_, _]], classOf[Map[_, _]])
    ctor.newInstance(base.sparkContext, None, None, ext, options,
      Map.empty[String, String])
  }

  /** Spark schema of one parquet file's footer, converted with Spark's
    * own `ParquetToSparkSchemaConverter` and an explicit `nanosAsLong`.
    * This is how `graft.Tables.events` reads TIMESTAMP(NANOS) files
    * WITHOUT mutating the session-global
    * `spark.sql.legacy.parquet.nanosAsLong` conf (schema inference
    * consults only the session conf, so a per-read option cannot do it,
    * and the set/restore window races concurrent reads on the same
    * session). `path` may be a data file or a flat directory of part
    * files. The flat-uniform assumption is CHECKED, not trusted: a
    * directory with subdirectories (a partitioned layout, which needs
    * partition discovery this fast path deliberately skips) is rejected
    * outright, and the other data files' footers must match the
    * first — ALL of them when the directory holds up to 16 files (every
    * driver table), else 16 evenly-spaced samples (a bounded driver-side
    * cost on huge directories; a drift the sampling misses is possible
    * there, which is the documented residual trade versus mergeSchema).
    * Named arguments keep the call safe against constructor-parameter
    * reordering across Spark versions. */
  def parquetFooterSchema(spark: SparkSession, path: String,
                          nanosAsLong: Boolean): org.apache.spark.sql.types.StructType = {
    val hconf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(hconf)
    val (file, sampled) =
      if (!fs.getFileStatus(p).isDirectory)
        (p, Seq.empty[org.apache.hadoop.fs.Path])
      else {
        val visible = fs.listStatus(p).filterNot { st =>
          val n = st.getPath.getName
          n.startsWith("_") || n.startsWith(".")
        }
        val dirs = visible.filter(_.isDirectory)
        if (dirs.nonEmpty) throw new IllegalArgumentException(
          s"$path contains subdirectories (e.g. ${dirs.head.getPath.getName}): " +
            "partitioned layouts need partition discovery — read them with " +
            "spark.read.parquet and session-level conf instead of the footer fast path")
        val data = visible.filter(_.isFile).map(_.getPath)
        if (data.isEmpty) throw new IllegalArgumentException(s"no data files under $path")
        // uniformity witnesses: every file for small directories, 16
        // evenly-spaced (first + last included) for large ones
        val maxChecks = 16
        val others =
          if (data.length <= maxChecks) data.tail.toSeq
          else (1 until maxChecks).map(i =>
            data(((i.toLong * (data.length - 1)) / (maxChecks - 1)).toInt))
        (data.head, others)
      }
    def footer(f: org.apache.hadoop.fs.Path) = {
      val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, hconf))
      try reader.getFooter.getFileMetaData.getSchema finally reader.close()
    }
    val message = footer(file)
    sampled.foreach { f2 =>
      val m2 = footer(f2)
      if (m2 != message) throw new IllegalArgumentException(
        s"non-uniform parquet footers under $path (${file.getName} vs " +
          s"${f2.getName}): schema-evolved datasets need mergeSchema, " +
          "not the footer fast path")
    }
    new org.apache.spark.sql.execution.datasources.parquet.ParquetToSparkSchemaConverter(
      nanosAsLong = nanosAsLong).convert(message)
  }
}
