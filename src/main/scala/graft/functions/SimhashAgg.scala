package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator` computing a 64-bit SimHash from a stream of token
  * hashes — the UDAF tier of the engine (SURVEY.md §7.3 "custom
  * aggregates via Aggregator[IN,BUF,OUT]").
  *
  * Buffer = 64 signed bit-counters; merge is element-wise addition, so
  * the aggregation is associative/commutative and Spark can partial-
  * aggregate map-side like any built-in — the property that makes a
  * sketch usable at 100 TB (constant-size state, one pass).
  *
  * Produces bit-for-bit the same signature as `llm.Dedup.simhash64`
  * (the 64-conditional-aggregate formulation); equivalence is tested.
  */
object SimhashAgg extends Aggregator[Long, Array[Int], Long] {

  override def zero: Array[Int] = new Array[Int](64)

  override def reduce(buf: Array[Int], tokenHash: Long): Array[Int] = {
    var j = 0
    while (j < 64) {
      if (((tokenHash >>> j) & 1L) == 1L) buf(j) += 1 else buf(j) -= 1
      j += 1
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Int]): Long = {
    var out = 0L
    var j = 0
    while (j < 64) {
      if (buf(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override def bufferEncoder: Encoder[Array[Int]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Int]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
