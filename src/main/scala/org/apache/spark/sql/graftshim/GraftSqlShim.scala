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

  def column(e: Expression): Column = ExpressionUtils.column(e)

  /** The bare `ScalaAggregator` AggregateFunction for a
    * `functions.udaf`-wrapped Aggregator — what `udf.register` hands the
    * function registry so the ANALYZER does the AggregateExpression
    * wrapping (returning a pre-wrapped expression from a registry
    * builder leaves the aggregate un-planned). `scalaAggregator` is
    * `private[sql]`, hence the shim seat; forwards only. */
  def scalaAggregator(u: org.apache.spark.sql.expressions.UserDefinedFunction,
                      children: Seq[Expression]): Expression =
    org.apache.spark.sql.execution.aggregate.ScalaAggregator(
      u.asInstanceOf[org.apache.spark.sql.expressions.UserDefinedAggregator[_, _, _]],
      children)

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

  /** Drain the async listener bus. `QueryExecutionListener` callbacks
    * (observed-metrics collection) dispatch on a separate thread, so a
    * caller reading metrics right after an action races them unless the
    * bus is drained first (`waitUntilEmpty` is `private[spark]`, hence
    * the shim seat). Forwards only. */
  def drainListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()

  /** Exhaustive `observe(...)` metric collection over an executed plan.
    *
    * `QueryExecution.observedMetrics` delegates to
    * `CollectMetricsExec.collect`, whose traversal (4.1.2) can return
    * EMPTY for plans it doesn't descend — seen in practice at the 100×
    * scaling point, where the q46 metric node sits under AQE wrapper
    * nesting the built-in walk misses while the same query at 1×/10×
    * reports fine. A skew-cap monitor that vanishes exactly at the
    * scale it guards is worse than none, so this walk descends EVERY
    * wrapper that hides a subtree from `children`: adaptive roots
    * (current `executedPlan`), materialized query stages (`plan`),
    * cached relations (`cachedPlan`), reused exchanges/subqueries
    * (their targets), plus expression-held subquery plans. Duplicate
    * names keep the row with the most non-null/non-zero content (the
    * self-join shape plans the same observe twice; only one copy's
    * accumulator received this run's task updates). */
  def collectObservedMetrics(plan: org.apache.spark.sql.execution.SparkPlan)
      : Map[String, org.apache.spark.sql.Row] = {
    import org.apache.spark.sql.execution.{CollectMetricsExec, SparkPlan}
    val found = scala.collection.mutable.Map.empty[String, org.apache.spark.sql.Row]
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    // prefer populated accumulators: a node copy whose stage never ran
    // reads [null,...]; the executed copy reads real values (zeros
    // included — a genuine all-zero row outranks an untouched one)
    def score(r: org.apache.spark.sql.Row): Int =
      if (r == null) -1
      else (0 until r.length).map { i =>
        if (r.isNullAt(i)) 0
        else if (r.get(i) == 0L || r.get(i) == 0) 1
        else 2
      }.sum
    def walk(p: SparkPlan): Unit = if (p != null && seen.add(p)) {
      p match {
        case c: CollectMetricsExec =>
          val row = c.collectedMetrics
          if (!found.contains(c.name) || score(row) > score(found(c.name)))
            found(c.name) = row
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          walk(a.executedPlan)
          // ALSO the initial plan and the materialized-stage cache:
          // AQE's empty-relation propagation can REPLACE the subtree
          // holding a CollectMetricsExec in the final plan (seen at the
          // 100× point: every LSH bucket capped → empty join input →
          // empty result). The initial tree keeps the node's SHAPE (a
          // copy with an untouched accumulator, so at least the name
          // surfaces), and the stage cache keeps the COPY THAT RAN —
          // its accumulator carries the real counts; score() prefers it.
          walk(a.initialPlan)
          try {
            val ctx = a.context
            Seq("stageCache", "subqueryCache").foreach { cache =>
              ctx.getClass.getMethod(cache).invoke(ctx)
                .asInstanceOf[scala.collection.concurrent.TrieMap[_, _]]
                .values.foreach {
                  case sp: org.apache.spark.sql.execution.SparkPlan => walk(sp)
                  case _ =>
                }
            }
          } catch { case _: ReflectiveOperationException => }
        case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          walk(q.plan)
        case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          walk(s.relation.cachedPlan)
        case r: org.apache.spark.sql.execution.exchange.ReusedExchangeExec =>
          walk(r.child)
        case s: org.apache.spark.sql.execution.ReusedSubqueryExec =>
          walk(s.child)
        case _ =>
      }
      p.children.foreach(walk)
      p.subqueries.foreach(walk)
    }
    walk(plan)
    found.toMap
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
