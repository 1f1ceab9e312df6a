package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Native Catalyst expression for 16-bit Morton (Z-order) interleaving —
  * the layout kernel behind multi-dimensional data skipping at 100 TB.
  *
  * `graft_zorder(x, y)` spreads the LOW 16 BITS of each operand and
  * interleaves them: result bit 2i is x's bit i, bit 2i+1 is y's bit i
  * (bits above 15 are masked off — callers normalize each dimension to
  * a 16-bit range first, by modulus or range-rank). Rows sorted by the
  * result follow the Z-order space-filling curve (Morton 1966), so a
  * `repartitionByRange(zval)` + sort-within-partitions parquet write
  * produces files whose per-file min/max statistics are TIGHT in BOTH
  * dimensions — a range predicate on either column prunes files, which
  * a single-column sort only provides for its leading column. That
  * file-skipping geometry is the entire value: the expression itself is
  * four shift-mask rounds per side, branchless, inside whole-stage
  * codegen.
  *
  * Determinism: pure bit arithmetic on integers — bit-identical across
  * engines, so queries over it stay DuckDB-hash-gradable (the oracle
  * restates the interleave as a sum over 16 bit positions, which is
  * the same number by construction).
  */
case class BitInterleave16(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_zorder"

  // registry-reachable from arbitrary SQL text: reject non-integral
  // inputs at analysis time, not with a runtime ClassCastException
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case LongType | IntegerType | ShortType | ByteType => true
      case _                                             => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two integral arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    BitInterleave16.interleave(
      a.asInstanceOf[Number].longValue, b.asInstanceOf[Number].longValue)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      // classic bit-spread: each round doubles the gap between kept bits
      def spread(v: String): String =
        s"""|$v = ($v | ($v << 8)) & 0x00FF00FFL;
            |$v = ($v | ($v << 4)) & 0x0F0F0F0FL;
            |$v = ($v | ($v << 2)) & 0x33333333L;
            |$v = ($v | ($v << 1)) & 0x55555555L;""".stripMargin
      s"""
         |long $x = ((long) $a) & 0xFFFFL;
         |long $y = ((long) $b) & 0xFFFFL;
         |${spread(x)}
         |${spread(y)}
         |${ev.value} = $x | ($y << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BitInterleave16 {
  val FnName = "graft_zorder"

  /** Interpreted twin of the generated code (and the spec's reference
    * point for the bit-loop formulation). */
  def interleave(a: Long, b: Long): Long = {
    def spread(v0: Long): Long = {
      var v = v0 & 0xFFFFL
      v = (v | (v << 8)) & 0x00FF00FFL
      v = (v | (v << 4)) & 0x0F0F0F0FL
      v = (v | (v << 2)) & 0x33333333L
      v = (v | (v << 1)) & 0x55555555L
      v
    }
    spread(a) | (spread(b) << 1)
  }

  /** Registry builder with an arity check — type errors are handled by
    * `checkInputDataTypes` at analysis. */
  def build(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(a, b) => BitInterleave16(a, b)
    case other => throw new IllegalArgumentException(
      s"$FnName takes exactly 2 arguments, got ${other.length}")
  }

  /** Idempotent SQL-registry registration (the extensions path installs
    * the same builder at session build time). */
  def register(s: SparkSession): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, build, "built-in")

  /** Column API: `zorder(s, $"a", $"b")`. */
  def zorder(s: SparkSession, a: Column, b: Column): Column = {
    register(s)
    call_function(FnName, a, b)
  }
}
