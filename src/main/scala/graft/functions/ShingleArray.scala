package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the distinct w-word shingles of a token
  * array — `graft_shingles(toks, w)` — replacing the interpreted
  * five-stage higher-order pipeline
  * `array_distinct(transform(sequence(0, greatest(n−w, 0)),
  * i -> concat_ws(" ", slice(toks, i+1, w))))` that every shingle
  * consumer (q34/q46/q87/q49/q165/q177/q189, the fixture generator,
  * the memoized `docShingles` build) previously evaluated per row.
  * Higher-order transforms are CodegenFallback in Spark and that
  * pipeline allocates a closure invocation, a slice copy and a
  * concat per POSITION plus a distinct pass per row; this expression
  * is one pass with one allocation per emitted shingle.
  *
  * Bit-parity contract with the replaced pipeline (pinned by every
  * shingle oracle and by FixtureDriftSpec, whose committed band
  * fixtures were generated through the OLD pipeline and must compare
  * equal under the new one):
  *  - n ≥ w: one shingle per position 0..n−w, tokens joined by " ";
  *  - 0 < n < w: exactly one shingle — the whole array joined (the
  *    `slice` cap semantics);
  *  - n = 0: one EMPTY-string shingle (sequence(0,0) emitted position
  *    0 and concat_ws of nothing is "");
  *  - distinct keeps FIRST-occurrence order (`array_distinct`'s
  *    contract, which the banded minhash fixtures depend on);
  *  - a null ELEMENT is SKIPPED within its window (`concat_ws`'s
  *    null-skipping contract — and the q162 oracle's, whose event-type
  *    arrays are not tokenizer output; throwing here would diverge
  *    from both the replaced pipeline and DuckDB on such data).
  * Null input array → null (UnaryExpression's null intolerance).
  */
case class ShingleArray(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"graft_shingles window must be >= 1, got $w")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = ShingleArray.FnName

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    ShingleArray.build(input.asInstanceOf[ArrayData], w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static-call kernel: keeps the surrounding operator inside
    // whole-stage codegen (no CodegenFallback row boxing) while the
    // loop itself stays in compiled Scala
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleArray.build($c, $w);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleArray {
  val FnName = "graft_shingles"

  private val Space = UTF8String.fromString(" ")

  /** The kernel (also the codegen call target — must stay public and
    * Java-callable): single pass, order-preserving distinct. concatWs
    * allocates fresh bytes for every emitted shingle, so the output
    * never aliases the input row buffer. */
  def build(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    val last = math.max(n - w, 0)
    val seen = new java.util.LinkedHashSet[UTF8String]((last + 1) * 2)
    var i = 0
    while (i <= last) {
      val m = math.min(w, n - i)
      // concat_ws semantics: null elements are skipped, not joined and
      // not errored — bit-parity with the replaced pipeline (and the
      // q162 oracle) on non-tokenizer inputs that may carry nulls
      var nonNull = 0
      var k = 0
      while (k < m) {
        if (!arr.isNullAt(i + k)) nonNull += 1
        k += 1
      }
      val parts = new Array[UTF8String](nonNull)
      k = 0; var p = 0
      while (k < m) {
        if (!arr.isNullAt(i + k)) { parts(p) = arr.getUTF8String(i + k); p += 1 }
        k += 1
      }
      seen.add(UTF8String.concatWs(Space, parts: _*))
      i += 1
    }
    new GenericArrayData(seen.toArray(new Array[AnyRef](seen.size())))
  }

}
