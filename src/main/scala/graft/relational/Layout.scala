package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.BitInterleave16

/** Physical-layout operators: Z-order clustering for multi-dimensional
  * data skipping.
  *
  * At 100 TB the scan is the query: a parquet lake pruned by per-file
  * min/max statistics reads only the files a predicate can touch, and
  * which files those are is decided by LAYOUT at write time. A single
  * sort gives tight statistics on the leading column only; interleaving
  * the dimensions' bits (the `graft_zorder` kernel,
  * `functions/BitInterleave.scala`) makes a ONE-dimensional sort key
  * whose ranges are small rectangles in BOTH dimensions, so a
  * `repartitionByRange(zval)` + sorted write yields files a predicate
  * on EITHER column can prune.
  *
  * q137 grades exactly that property end-to-end and hash-checkably: it
  * normalizes both keys into the 16-bit curve domain, computes the
  * curve position for every lineitem row, cuts the curve into the 64
  * equal Z-RANGES a clustered write would use as file boundaries, and
  * reports each range's row count and min/max envelope in both
  * dimensions — the same numbers a parquet footer would carry. The
  * envelope widths ARE the pruning effectiveness (LayoutSpec asserts
  * each range stays a rectangle ≤ 1/8 of the domain per side); the
  * DuckDB oracle restates the interleave as a per-bit sum, so the
  * whole layout decision is hash-graded, not just spot-checked.
  */
object Layout {

  /** q137: Z-order layout audit over lineitem (l_partkey × l_suppkey).
    *
    * Normalization is exact integer min/max scaling —
    * `((k − min) · 65535) div (max − min)` — broadcast from a one-row
    * extent aggregate, so there is no global-sort window anywhere (a
    * production write uses sampled range bounds the same way
    * `repartitionByRange` does; rank-based normalization would funnel
    * the table through one window partition). All arithmetic is BIGINT
    * division, bit-identical in DuckDB (`//`). 64 buckets ≈ the target
    * file count of a clustered write of this slice; a 64-way cut of
    * the 32-bit curve fixes the top 3 bits of EACH dimension, so every
    * bucket is an axis-aligned rectangle covering ≤ 1/8 of the domain
    * per side — that bound is what makes min/max pruning effective on
    * both predicate columns. */
  /** (df ++ zval): both columns normalized into the 16-bit curve
    * domain by exact integer min/max scaling (broadcast 1-row extent),
    * then interleaved. The write path (`zorderWrite`, LayoutSpec) and
    * the graded audit (q137) share this exact derivation. */
  def withZval(df: DataFrame, c1: String, c2: String): DataFrame = {
    val s = df.sparkSession
    val ext = df.agg(
      min(col(c1)).as("zmin1"), max(col(c1)).as("zmax1"),
      min(col(c2)).as("zmin2"), max(col(c2)).as("zmax2"))
    df.crossJoin(broadcast(ext))
      .withColumn("zn1", expr(
        s"CASE WHEN zmax1 = zmin1 THEN 0L " +
          s"ELSE (($c1 - zmin1) * 65535L) div (zmax1 - zmin1) END"))
      .withColumn("zn2", expr(
        s"CASE WHEN zmax2 = zmin2 THEN 0L " +
          s"ELSE (($c2 - zmin2) * 65535L) div (zmax2 - zmin2) END"))
      .withColumn("zval", BitInterleave16.zorder(s, col("zn1"), col("zn2")))
      .drop("zmin1", "zmax1", "zmin2", "zmax2", "zn1", "zn2")
  }

  /** The clustered write itself: range-partition on the curve
    * position, sort within partitions, drop the key, write. Each
    * output file covers one contiguous z-range ⇒ its parquet min/max
    * footer envelope is bounded in BOTH dimensions (demonstrated
    * end-to-end in LayoutSpec against real written files). */
  def zorderWrite(df: DataFrame, c1: String, c2: String,
                  files: Int, path: String): Unit = {
    withZval(df, c1, c2)
      .repartitionByRange(files, col("zval"))
      .sortWithinPartitions(col("zval"))
      .drop("zval")
      .write.mode("overwrite").parquet(path)
  }

  def q137ZorderLayout(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, dir).select($"l_partkey", $"l_suppkey")
    withZval(li, "l_partkey", "l_suppkey")
      .withColumn("zbucket", shiftright($"zval", 26))
      .groupBy($"zbucket")
      .agg(
        count(lit(1)).as("n_rows"),
        min($"l_partkey").as("pk_min"), max($"l_partkey").as("pk_max"),
        min($"l_suppkey").as("sk_min"), max($"l_suppkey").as("sk_max"))
      .withColumn("pk_span", $"pk_max" - $"pk_min")
      .withColumn("sk_span", $"sk_max" - $"sk_min")
      .orderBy($"zbucket")
  }

  /** The interleave restated as a sum over the 16 bit positions —
    * identical integers by construction (each kept bit lands at 2i /
    * 2i+1 exactly as the shift-mask spread places it). */
  val q137Sql: String =
    """WITH ext AS (
      |  SELECT min(l_partkey) AS pkmin, max(l_partkey) AS pkmax,
      |         min(l_suppkey) AS skmin, max(l_suppkey) AS skmax
      |  FROM lineitem),
      |norm AS (
      |  SELECT l_partkey, l_suppkey,
      |    CASE WHEN pkmax = pkmin THEN 0
      |         ELSE ((l_partkey - pkmin) * 65535) // (pkmax - pkmin) END AS pk16,
      |    CASE WHEN skmax = skmin THEN 0
      |         ELSE ((l_suppkey - skmin) * 65535) // (skmax - skmin) END AS sk16
      |  FROM lineitem, ext),
      |z AS (
      |  SELECT l_partkey, l_suppkey,
      |    CAST(list_sum([
      |      (((pk16 >> i) & 1) << (2*i)) + (((sk16 >> i) & 1) << (2*i + 1))
      |      FOR i IN generate_series(0, 15)]) AS BIGINT) AS zval
      |  FROM norm)
      |SELECT zval >> 26 AS zbucket, count(*) AS n_rows,
      |  min(l_partkey) AS pk_min, max(l_partkey) AS pk_max,
      |  min(l_suppkey) AS sk_min, max(l_suppkey) AS sk_max,
      |  max(l_partkey) - min(l_partkey) AS pk_span,
      |  max(l_suppkey) - min(l_suppkey) AS sk_span
      |FROM z GROUP BY 1 ORDER BY zbucket""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q137_zorder_layout" -> (q137ZorderLayout _)
  )

  val oracle: Map[String, String] = Map(
    "q137_zorder_layout" -> q137Sql
  )
}
