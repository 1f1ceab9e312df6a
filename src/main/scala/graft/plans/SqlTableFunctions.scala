package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{IntegerType, LongType, NullType, ShortType, StringType}

/** SQL front door for the two whole-operator custom tiers: table-valued
  * functions `graft_asof(...)` and `graft_topk(...)`, so a SQL-first
  * session reaches [[AsOfJoinExec]] and [[TopKPerGroupExec]] from plain
  * query text — the same completion `graft_cosine` gave the expression
  * tier. The reference's own consumers are SQL-shaped queue queries
  * (ref `agents/orbiter.md:85-90`), so text, not a Scala DSL, is the
  * surface a migrating user actually holds.
  *
  * Shape: Spark's parser already turns `FROM f(args...)` into an
  * `UnresolvedTableValuedFunction` resolved against the session's
  * TableFunctionRegistry (the mechanism behind the built-in `range`),
  * so no parser extension is needed — the builders below receive the
  * literal argument expressions and return the SAME logical nodes the
  * DataFrame helpers build, via those helpers. Installed at session
  * build by `GraftExtensions.injectTableFunction` or idempotently at
  * call time by [[GraftTableFunctions.register]].
  *
  * Relations are named (table/temp-view identifiers) rather than passed
  * as subqueries because the TVF argument grammar admits only scalar
  * expressions — the documented usage is "register or name the sides,
  * then join them by name", mirroring how `range` takes scalars.
  *
  * All arguments must be foldable (literals or constant-foldable
  * expressions): the builder runs once during analysis, so anything
  * row-dependent is meaningless there and is rejected with the argument
  * position in the message.
  */
object GraftTableFunctions {
  val AsOfFn = "graft_asof"
  val TopKFn = "graft_topk"

  private def fail(fn: String, pos: Int, want: String, got: Any): Nothing =
    throw new IllegalArgumentException(
      s"$fn: argument ${pos + 1} must be $want, got $got")

  // The builders run during ANALYSIS, so an argument expression may be
  // unresolved (e.g. a bare column reference `graft_asof(a, ...)` — there
  // is no input relation for it to bind against). `foldable`/`dataType`
  // THROW UnresolvedException on such expressions; guarding on
  // `e.resolved` first keeps the user-facing error the function's own
  // positional "must be a ... literal" message instead of Spark's
  // internal-invariant wording.
  private def strArg(fn: String, args: Seq[Expression], pos: Int,
                     what: String): String = {
    val e = args(pos)
    if (!e.resolved || !e.foldable || e.dataType != StringType)
      fail(fn, pos, s"a string literal ($what)", e.sql)
    val v = e.eval()
    if (v == null) fail(fn, pos, s"a non-NULL string ($what)", "NULL")
    v.toString
  }

  /** Comma-separated identifier list ('' => empty). */
  private def names(fn: String, args: Seq[Expression], pos: Int,
                    what: String): Seq[String] =
    strArg(fn, args, pos, what)
      .split(",").iterator.map(_.trim).filter(_.nonEmpty).toSeq

  private def intArg(fn: String, args: Seq[Expression], pos: Int,
                     what: String): Int = {
    val e = args(pos)
    val ok = e.resolved && e.foldable &&
      (e.dataType == IntegerType || e.dataType == LongType || e.dataType == ShortType)
    if (!ok) fail(fn, pos, s"an integer literal ($what)", e.sql)
    e.eval() match {
      case null => fail(fn, pos, s"a non-NULL integer ($what)", "NULL")
      case n: java.lang.Number => n.longValue() match {
        case v if v >= Int.MinValue && v <= Int.MaxValue => v.toInt
        case v => fail(fn, pos, s"an int-range value ($what)", v)
      }
      case other => fail(fn, pos, s"an integer literal ($what)", other)
    }
  }

  /** NULL (any type) => None; otherwise a non-negative long literal. */
  private def longOptArg(fn: String, args: Seq[Expression], pos: Int,
                         what: String): Option[Long] = {
    val e = args(pos)
    if (!e.resolved || !e.foldable) fail(fn, pos, s"a literal ($what)", e.sql)
    if (e.dataType == NullType) return None
    if (e.dataType != LongType && e.dataType != IntegerType && e.dataType != ShortType)
      fail(fn, pos, s"a bigint literal or NULL ($what)", e.sql)
    Option(e.eval()).map(_.asInstanceOf[java.lang.Number].longValue())
  }

  /** The side tables come from the ACTIVE session's catalog — the TVF
    * builder runs on the session's analysis thread, where
    * `SparkSession.active` is exactly the session executing the query. */
  private def sideTable(fn: String, name: String): DataFrame = {
    val s = SparkSession.active
    try s.table(name)
    catch { case e: org.apache.spark.sql.AnalysisException =>
      throw new IllegalArgumentException(
        s"$fn: relation '$name' not found in the session catalog " +
          s"(register it first: df.createOrReplaceTempView(...)): ${e.getMessage}")
    }
  }

  /** `graft_asof(left, right, leftKeys, rightKeys, leftTime, rightTime
    *             [, tieBreak [, direction [, joinType [, tolerance]]]])`
    * — string literals throughout except `tolerance` (bigint or NULL, in
    * the time column's native internal unit). Key/tieBreak lists are
    * comma-separated. Defaults match [[AsOf.join]]: no tieBreak,
    * 'backward', 'inner', no tolerance. */
  private[plans] def asofBuilder(args: Seq[Expression]): LogicalPlan = {
    if (args.length < 6 || args.length > 10)
      throw new IllegalArgumentException(
        s"$AsOfFn takes 6-10 arguments (left, right, leftKeys, rightKeys, " +
          s"leftTime, rightTime [, tieBreak [, direction [, joinType " +
          s"[, tolerance]]]]), got ${args.length}")
    val left = sideTable(AsOfFn, strArg(AsOfFn, args, 0, "left relation"))
    val right0 = sideTable(AsOfFn, strArg(AsOfFn, args, 1, "right relation"))
    // A SQL self-join names one view twice (or two views over one base
    // plan): both sides then carry the SAME attribute exprIds, the shape
    // AsOf.join refuses because the output projection would silently
    // bind right columns to their left twins. Re-aliasing every right
    // column mints fresh exprIds with unchanged names — the rename
    // AsOf.join's error message asks the Scala caller to do by hand.
    val right = right0.select(right0.columns.map(c => col(c).as(c)).toSeq: _*)
    AsOf.join(
      left, right,
      leftKeys = names(AsOfFn, args, 2, "left key columns"),
      rightKeys = names(AsOfFn, args, 3, "right key columns"),
      leftTimeCol = strArg(AsOfFn, args, 4, "left time column"),
      rightTimeCol = strArg(AsOfFn, args, 5, "right time column"),
      tieBreak =
        if (args.length > 6) names(AsOfFn, args, 6, "tie-break columns") else Nil,
      direction =
        if (args.length > 7) strArg(AsOfFn, args, 7, "direction") else "backward",
      joinType =
        if (args.length > 8) strArg(AsOfFn, args, 8, "join type") else "inner",
      tolerance =
        if (args.length > 9) longOptArg(AsOfFn, args, 9, "tolerance") else None
    ).queryExecution.analyzed
  }

  /** `graft_topk(table, k, groupCols, orderSpec)` — `orderSpec` is a
    * comma-separated list of `column [asc|desc]` (asc default), e.g.
    * `'o_totalprice desc, o_orderkey'`. */
  private[plans] def topkBuilder(args: Seq[Expression]): LogicalPlan = {
    if (args.length != 4)
      throw new IllegalArgumentException(
        s"$TopKFn takes 4 arguments (table, k, groupCols, orderSpec), " +
          s"got ${args.length}")
    val df = sideTable(TopKFn, strArg(TopKFn, args, 0, "input relation"))
    val k = intArg(TopKFn, args, 1, "k")
    val groupBy = names(TopKFn, args, 2, "group columns")
    val orderBy = names(TopKFn, args, 3, "order spec").map { spec =>
      spec.split("\\s+").toSeq match {
        case Seq(n) => TopK.Ord(n)
        case Seq(n, d) if d.equalsIgnoreCase("asc") => TopK.Ord(n)
        case Seq(n, d) if d.equalsIgnoreCase("desc") => TopK.Ord(n, asc = false)
        case _ => throw new IllegalArgumentException(
          s"$TopKFn: order spec entry '$spec' is not 'column [asc|desc]'")
      }
    }
    TopK.perGroup(df, groupBy, orderBy, k).queryExecution.analyzed
  }

  /** The (identifier, info, builder) triples `GraftExtensions` injects at
    * session build. */
  def descriptions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => LogicalPlan)] =
    Seq(
      (FunctionIdentifier(AsOfFn),
        new ExpressionInfo(getClass.getCanonicalName, AsOfFn),
        asofBuilder _),
      (FunctionIdentifier(TopKFn),
        new ExpressionInfo(getClass.getCanonicalName, TopKFn),
        topkBuilder _))

  /** Idempotent call-time registration for sessions built without
    * `GraftExtensions` — the table-function twin of `CosineSim.register`. */
  def register(s: SparkSession): Unit =
    descriptions.foreach { case (id, _, builder) =>
      s.sessionState.tableFunctionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }
}
