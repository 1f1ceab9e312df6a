package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.BitInterleave16
import graft.relational.Layout

class LayoutSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  /** Bit-loop reference formulation: result bit 2i ← a bit i,
    * bit 2i+1 ← b bit i (the oracle SQL computes this same sum). */
  private def refInterleave(a: Long, b: Long): Long =
    (0 until 16).map { i =>
      (((a & 0xFFFFL) >> i) & 1L) << (2 * i) |
      (((b & 0xFFFFL) >> i) & 1L) << (2 * i + 1)
    }.sum

  test("shift-mask spread equals the bit-loop reference for arbitrary longs") {
    val rnd = new scala.util.Random(42)
    (0 until 2000).foreach { _ =>
      val (a, b) = (rnd.nextLong(), rnd.nextLong())
      assert(BitInterleave16.interleave(a, b) == refInterleave(a, b), s"($a,$b)")
    }
    // worked examples: z(3,5) = interleave(0b011, 0b101) = 0b100111
    assert(BitInterleave16.interleave(3L, 5L) == 0x27L)
    assert(BitInterleave16.interleave(0xFFFFL, 0xFFFFL) == 0xFFFFFFFFL)
    assert(BitInterleave16.interleave(0x10000L, 0L) == 0L) // bits ≥16 masked
  }

  test("codegen path matches the interpreted twin and SQL registry resolves") {
    val df = Seq((3L, 5L), (65535L, 0L), (12345L, 54321L))
      .toDF("a", "b")
      .withColumn("z", BitInterleave16.zorder(spark, $"a", $"b"))
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (a, b, z) =>
      assert(z == BitInterleave16.interleave(a, b), s"($a,$b)")
    }
    assert(spark.sql("SELECT graft_zorder(3L, 5L) AS z").collect().head.getLong(0) == 0x27L)
    // NULL intolerance: either side null → null
    assert(spark.sql("SELECT graft_zorder(CAST(NULL AS BIGINT), 5L) AS z")
      .collect().head.isNullAt(0))
    // non-integral inputs are rejected at analysis, not at runtime
    val err = intercept[Exception] {
      spark.sql("SELECT graft_zorder('x', 5L)").collect()
    }
    assert(err.getMessage.contains("integral"), err.getMessage)
  }

  test("z-order clustered write: real files carry prunable envelopes in both dims") {
    val li = Tables.lineitem(spark, sf).select($"l_partkey", $"l_suppkey")
    val out = "/tmp/graft_zorder_write"
    Layout.zorderWrite(li, "l_partkey", "l_suppkey", files = 64, path = out)
    val rd = spark.read.parquet(out).withColumn("f", input_file_name())
    val files = rd.groupBy($"f").agg(
      (max($"l_partkey") - min($"l_partkey")).as("ps"),
      (max($"l_suppkey") - min($"l_suppkey")).as("ss"),
      count(lit(1)).as("n")).collect()
    assert(files.length >= 16, s"expected many files, got ${files.length}")
    val ext = li.agg(
      (max($"l_partkey") - min($"l_partkey")).as("p"),
      (max($"l_suppkey") - min($"l_suppkey")).as("s")).collect().head
    val (ps, ss) = (ext.getLong(0), ext.getLong(1))
    // repartitionByRange samples boundaries, so they are not bit-aligned:
    // a file can straddle one high-bit cell edge and pay a wide envelope
    // in one dimension. The MEDIAN file is cell-interior — that is the
    // honest per-file pruning claim — and row counts must conserve.
    def med(xs: Seq[Long]): Long = xs.sorted.apply(xs.length / 2)
    val medPs = med(files.map(_.getLong(1)).toSeq)
    val medSs = med(files.map(_.getLong(2)).toSeq)
    assert(medPs <= ps / 8.0 * 1.2 + 2, s"median pk envelope $medPs vs global $ps")
    assert(medSs <= ss / 8.0 * 1.2 + 2, s"median sk envelope $medSs vs global $ss")
    assert(files.map(_.getLong(3)).sum == li.count())
  }

  test("q137 buckets are tight rectangles in BOTH dimensions") {
    val rows = Layout.q137ZorderLayout(spark, sf).collect()
    assert(rows.length > 8, s"expected many z-ranges, got ${rows.length}")
    val li = Tables.lineitem(spark, sf)
      .agg(min($"l_partkey"), max($"l_partkey"), min($"l_suppkey"), max($"l_suppkey"))
      .collect().head
    val (pkSpan, skSpan) = (li.getLong(1) - li.getLong(0), li.getLong(3) - li.getLong(2))
    // a 64-way cut of the 32-bit curve fixes the top 3 bits of EACH
    // normalized dimension, so every bucket's envelope covers ≤ 1/8 of
    // the domain per side (plus integer-scaling rounding slack) — the
    // quantified file-skipping claim
    rows.foreach { r =>
      assert(r.getAs[Long]("pk_span") <= pkSpan / 8.0 * 1.05 + 2,
        s"bucket ${r.getAs[Long]("zbucket")} pk_span ${r.getAs[Long]("pk_span")} vs global $pkSpan")
      assert(r.getAs[Long]("sk_span") <= skSpan / 8.0 * 1.05 + 2,
        s"bucket ${r.getAs[Long]("zbucket")} sk_span ${r.getAs[Long]("sk_span")} vs global $skSpan")
    }
    // bucket counts cover the whole table
    val total = rows.map(r => r.getAs[Long]("n_rows")).sum
    assert(total == Tables.lineitem(spark, sf).count())
  }
}
