package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions.call_function

/** Native Catalyst expression: |A ∩ B| of two SORTED string arrays by
  * a single allocation-free merge pass — the verification kernel of
  * the exact Jaccard operators (q34's hot loop).
  *
  * Why not `size(array_intersect(a, b))`: that builds a hash set from
  * one side, probes the other, materializes the intersection as a NEW
  * string array — two allocations plus hashing per pair — and then
  * throws the array away for its size. At 486k candidate pairs
  * (sf0.1) the merge count is the difference between verification
  * being the top cost and not. The inputs' contract: both arrays
  * sorted ascending (Spark's `array_sort`, i.e. UTF8 binary order —
  * the same comparator this merge uses) and duplicate-free
  * (`array_distinct`); under that contract the count equals
  * `size(array_intersect(...))` exactly, which is what keeps the
  * DuckDB oracle parity (`list_intersect` length) byte-for-byte.
  *
  * Null ELEMENTS are rejected at runtime (errors-not-degradation,
  * same stance as the cosine dim guard): a null token in a dedup
  * pipeline is upstream corruption, not a 0-overlap vote.
  */
case class SortedOverlapCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_overlap"

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(StringType, _) => true
      case _                        => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<string> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (n1, n2) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var cnt = 0
    while (i < n1 && j < n2) {
      if (x.isNullAt(i) || y.isNullAt(j)) throw new IllegalArgumentException(
        s"$prettyName: null token in input array")
      val c = x.getUTF8String(i).compareTo(y.getUTF8String(j))
      if (c == 0) { cnt += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    cnt
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n1 = ctx.freshName("n1"); val n2 = ctx.freshName("n2")
      val cnt = ctx.freshName("cnt"); val c = ctx.freshName("c")
      s"""
         |int $n1 = $a.numElements(); int $n2 = $b.numElements();
         |int $i = 0; int $j = 0; int $cnt = 0;
         |while ($i < $n1 && $j < $n2) {
         |  if ($a.isNullAt($i) || $b.isNullAt($j)) {
         |    throw new IllegalArgumentException(
         |      "graft_sorted_overlap: null token in input array");
         |  }
         |  int $c = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |  if ($c == 0) { $cnt++; $i++; $j++; }
         |  else if ($c < 0) { $i++; } else { $j++; }
         |}
         |${ev.value} = $cnt;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedOverlapCount {
  val FnName = "graft_sorted_overlap"

  def build(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(a, b) => SortedOverlapCount(a, b)
    case other => throw new IllegalArgumentException(
      s"$FnName takes exactly 2 arguments, got ${other.length}")
  }

  /** Idempotently register in the session's SQL registry. */
  def register(s: SparkSession): Unit =
    s.sessionState.functionRegistry.createOrReplaceTempFunction(
      FnName, build, "built-in")

  /** Register and return an invoking Column (same shim-free pattern as
    * `CosineSim.cosine`). */
  def overlap(s: SparkSession, a: Column, b: Column): Column = {
    register(s)
    call_function(FnName, a, b)
  }
}
