package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the engine's declared operator catalog (one entry per
  * SURVEY.md §2 operator); `oracleSql` carries DuckDB-equivalent ANSI SQL
  * for the hash-compare correctness gate. Column names/aliases are kept
  * identical on both sides (the driver sorts columns by name before
  * hashing).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's scheduler query ("among eligible queued plans pick the
    * highest-priority oldest", `agents/orbiter.md:85-90`) restated
    * relationally: top-k revenue orders for one segment. */
  def entry(spark: SparkSession): DataFrame =
    relational.Core.q02TopkRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg"            -> (relational.Core.q01Agg _),
    "q02_topk_revenue"   -> (relational.Core.q02TopkRevenue _),
    "q03_join_brand"     -> (relational.Core.q03JoinBrand _),
    "q04_semi_join"      -> (relational.Core.q04SemiJoin _),
    "q05_anti_join"      -> (relational.Core.q05AntiJoin _),
    "q06_outer_join"     -> (relational.Core.q06OuterJoin _),
    "q07_window_rank"    -> (relational.Core.q07WindowRank _),
    "q08_window_running" -> (relational.Core.q08WindowRunning _),
    "q09_set_ops"        -> (relational.Core.q09SetOps _),
    "q10_rollup"         -> (relational.Core.q10Rollup _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_agg"            -> relational.Core.q01Sql,
    "q02_topk_revenue"   -> relational.Core.q02Sql,
    "q03_join_brand"     -> relational.Core.q03Sql,
    "q04_semi_join"      -> relational.Core.q04Sql,
    "q05_anti_join"      -> relational.Core.q05Sql,
    "q06_outer_join"     -> relational.Core.q06Sql,
    "q07_window_rank"    -> relational.Core.q07Sql,
    "q08_window_running" -> relational.Core.q08Sql,
    "q09_set_ops"        -> relational.Core.q09Sql,
    "q10_rollup"         -> relational.Core.q10Sql,
  )
}
