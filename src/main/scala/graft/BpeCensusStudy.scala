package graft

import org.apache.spark.sql.SparkSession

/** Measures the census-delta maintenance win in the batched BPE
  * training loop (VERDICT r18 item 5): runs `bpeTrainIntBatched` at
  * k=64 on each given dataset dir, once with the delta-maintained
  * census (the q264 engine default) and once with the full per-round
  * re-census, asserts the merge tables are identical, and prints one
  * STUDY line per (dir, mode) with wall seconds and census rounds.
  * Deliberately NOT a bench-record writer.
  *
  * Usage: `runMain graft.BpeCensusStudy <dir1,dir2,...>` — a pseudo-dir
  * `wide:<nWords>` builds the wide-vocabulary synthetic corpus (every
  * word distinct, 10 letters over a–z, hash-derived — the production
  * vocabulary shape where each merge rewrites ~1% of the word table
  * and the delta census is the win; the parquet corpora's constant
  * 31-word table is the opposite extreme, where it is pure
  * overhead). */
object BpeCensusStudy {
  def main(args: Array[String]): Unit = {
    require(args.length == 1, "usage: BpeCensusStudy <dir1,dir2,...>")
    val dirs = args(0).split(",").toSeq.map(_.trim).filter(_.nonEmpty)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def corpusOf(dir: String): org.apache.spark.sql.DataFrame =
      if (dir.startsWith("wide:")) {
        val n = dir.stripPrefix("wide:").toInt
        // deterministic 10-letter words, all distinct (the id rides in
        // the low digits), letters hash-mixed — no RNG, rebuildable
        spark.range(n).select(($"id" % 1000).as("doc_id"),
          org.apache.spark.sql.functions.expr(
            """concat_ws('', transform(sequence(0, 9), j ->
              |  char(97 + pmod(hash(id * 31 + j), 26))))""".stripMargin)
            .as("text"))
      } else Tables.documents(spark, dir)
    for (dir <- dirs) {
      val docs = corpusOf(dir)
      // warm the JIT + input once per dir, in BOTH modes so neither
      // timed run inherits a cold-path penalty
      llm.TextOps.bpeTrainIntBatched(docs, k = 4, deltaCensus = true)
      llm.TextOps.bpeTrainIntBatched(docs, k = 4, deltaCensus = false)
      Ckpt.sweep(spark)
      var tables = Map.empty[Boolean, Vector[(Int, Int, Long, String, String, String, Long)]]
      for (delta <- Seq(true, false)) {
        val t0 = System.nanoTime()
        val (m, rounds) = llm.TextOps.bpeTrainIntBatched(
          docs, k = 64, deltaCensus = delta)
        val wall = (System.nanoTime() - t0) / 1e9
        tables += delta -> m
        println(f"STUDY bpe_census dir=$dir delta=$delta rounds=$rounds " +
          f"wall=$wall%.1fs merges=${m.length}")
        Ckpt.sweep(spark)
      }
      require(tables(true) == tables(false),
        s"delta census diverged from full census on $dir")
      println(s"STUDY bpe_census dir=$dir merge tables IDENTICAL")
    }
    spark.stop()
  }
}
