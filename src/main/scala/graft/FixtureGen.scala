package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Oracle-fixture generator (VERDICT r11 item 5): xxhash64 is not
  * DuckDB-expressible, so the xxhash64-family dedup queries (q46/q47/
  * q48) were graded rows-only, with md5 twins carrying the hash grade.
  * This main precomputes the ENGINE-SPECIFIC hash stage of each — the
  * q46 band table, the q47 simhash signatures, the q48 per-token
  * hashes — as small parquet side inputs under `fixtures/`
  * (git-committed), and the oracle SQL `read_parquet`s them so DuckDB
  * can replay everything DOWNSTREAM of the hash (width caps, bucket
  * equi-joins, Jaccard/Hamming verification, the Karp–Rabin fold)
  * against the live Spark result. The hash stage itself stays pinned
  * by the md5 twins (q107/q109/q110) and DedupSpec's constructed
  * corpora; the fixture adds direct hash-grading of the production
  * path's downstream semantics.
  *
  * Drift discipline: the fixtures are derived BY the same code the
  * queries run ([[llm.Dedup.xxhBanded]] etc. — shared helpers, not
  * copies), at the driver's verification scale factor (sf0.01). If
  * the shingle/minhash/banding code ever changes, the driver's hash
  * gate fails loudly until this main is rerun:
  * `sbt "runMain graft.FixtureGen /root/testdata/sf0.01 fixtures"`.
  */
object FixtureGen {
  /** Spark writes `part-<uuid>` + crc/_SUCCESS noise; a committed
    * fixture wants one stable `data.parquet` so regeneration diffs
    * only when the DATA changes. */
  private def tidy(dir: String): Unit = {
    val d = new java.io.File(dir)
    val part = d.listFiles().find(f =>
      f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(sys.error(s"no part file written under $dir"))
    val dst = new java.io.File(d, "data.parquet")
    if (dst.exists()) dst.delete()
    require(part.renameTo(dst), s"rename failed: $part")
    d.listFiles().filterNot(_.getName == "data.parquet").foreach(_.delete())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.drop(1).headOption.getOrElse("fixtures")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val toks = Tables.documents(spark, sfDir)
      .select($"doc_id", llm.TextOps.tokens($"text").as("toks"))

    // q46: the (doc_id, band, bkt) band table of the xxhash64 minhash
    // path — exactly what lshCandidates self-joins on.
    val sh = toks.select($"doc_id", llm.Dedup.shingles($"toks").as("sh"))
    llm.Dedup.xxhBanded(llm.Dedup.minhashSigs(sh))
      .orderBy($"doc_id", $"band")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/q46_banded_sf001")
    tidy(s"$outDir/q46_banded_sf001")

    // q47: the (doc_id, simhash) signature table of the xxhash64
    // simhash path — what simhashChunkPairs explodes and joins.
    llm.Dedup.simhash64(toks, "doc_id", "toks")
      .orderBy($"doc_id")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/q47_simhash_sf001")
    tidy(s"$outDir/q47_simhash_sf001")

    // q48: per-token xxhash64 pre-mod values over the corpus vocabulary
    // — the oracle replays the order-sensitive Karp–Rabin fold itself.
    toks.select(explode($"toks").as("tok")).distinct()
      .select($"tok", pmod(xxhash64($"tok"), lit(2147483647L)).as("h"))
      .orderBy($"tok")
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/q48_tokhash_sf001")
    tidy(s"$outDir/q48_tokhash_sf001")

    spark.stop()
  }
}
