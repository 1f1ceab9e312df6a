package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession, functions}
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
object SimhashAgg extends Aggregator[Long, Array[Long], Long] {

  // Long counters, matching simhash64's LongType sums: Int would wrap
  // negative past ~2.1e9 same-bit inputs in one group (plausible when
  // grouping by corpus slice at scale, not per doc) and silently flip
  // that signature bit relative to the column-wise formulation.
  override def zero: Array[Long] = new Array[Long](64)

  override def reduce(buf: Array[Long], tokenHash: Long): Array[Long] = {
    var j = 0
    while (j < 64) {
      if (((tokenHash >>> j) & 1L) == 1L) buf(j) += 1 else buf(j) -= 1
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Long]): Long = {
    var out = 0L
    var j = 0
    while (j < 64) {
      if (buf(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong

  /** SQL name — `graft_simhash(tokenHash)` aggregates a group's 64-bit
    * token hashes into the group's SimHash signature from plain SQL
    * text, completing the custom-tier front doors (`graft_cosine` for
    * expressions, `graft_asof`/`graft_topk` for whole operators). */
  val FnName = "graft_simhash"

  /** SQL-facing twin with standard aggregate NULL semantics: a NULL
    * token hash is SKIPPED (like sum/avg/count(col)), and a group with
    * no non-NULL inputs yields NULL — the primitive-Long Aggregator
    * above would instead decode NULL to 0 and let it VOTE (all 64 bits
    * −1), silently skewing the signature of any group containing one
    * null row. Buffer slot 64 counts non-null inputs so finish can
    * tell "all votes cancelled" (signature 0) from "no inputs" (NULL). */
  private object NullSafeSimhash
      extends Aggregator[java.lang.Long, Array[Long], java.lang.Long] {
    override def zero: Array[Long] = new Array[Long](65)
    override def reduce(buf: Array[Long], h: java.lang.Long): Array[Long] = {
      if (h != null) {
        val v = h.longValue()
        var j = 0
        while (j < 64) {
          if (((v >>> j) & 1L) == 1L) buf(j) += 1 else buf(j) -= 1
          j += 1
        }
        buf(64) += 1
      }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var j = 0
      while (j < 65) { a(j) += b(j); j += 1 }
      a
    }
    override def finish(buf: Array[Long]): java.lang.Long =
      if (buf(64) == 0) null
      else {
        var out = 0L
        var j = 0
        while (j < 64) {
          if (buf(j) > 0) out |= (1L << j)
          j += 1
        }
        java.lang.Long.valueOf(out)
      }
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[java.lang.Long] = Encoders.LONG
  }

  /** The Aggregator wrapped as a UDAF — one shared instance so the SQL
    * registry path and any Column-API caller bind the same function. */
  lazy val asUdaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    functions.udaf(NullSafeSimhash, Encoders.LONG)

  /** Idempotent call-time registration for sessions built without
    * `GraftExtensions` — the UDAF twin of `CosineSim.register`. */
  def register(s: SparkSession): Unit =
    s.udf.register(FnName, asUdaf)
}
