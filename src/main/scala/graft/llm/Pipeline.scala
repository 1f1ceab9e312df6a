package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** End-to-end curation pipeline — the composition a training-data user
  * actually runs, chaining the engine's operators in their production
  * order (each stage narrows the corpus before the next, more expensive
  * one):
  *
  *   1. exact dedup on the normalized fingerprint (q33's identity);
  *   2. quality gate: token count + stopword-ratio tier (q32);
  *   3. language filter via the lang-ID heuristic (q35);
  *   4. near-dup suppression: MinHash-LSH candidates (q46's shape),
  *      keeping the lower doc_id of each surviving pair;
  *   5. emit the curated corpus with its provenance columns.
  *
  * One pass per stage, all narrow or bucket-joined — the funnel shape
  * (cheap filters first, pairwise work last on the smallest set) is the
  * 100 TB cost model.
  */
object Pipeline {

  def curate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)

    // 1. exact dedup on normalized text (keep the smallest doc_id)
    val fp = docs.withColumn("fp",
      md5(trim(regexp_replace(lower($"text"), "\\s+", " "))))
    val keepers = fp.groupBy($"fp").agg(min($"doc_id").as("doc_id"))
    val deduped = fp.join(keepers, Seq("fp", "doc_id"))

    // 2. quality gate
    val stop = "('the','a','an','of','and','to','in','is','it','for')"
    val scored = deduped
      .withColumn("toks", regexp_extract_all(lower($"text"), lit("\\S+"), lit(0)))
      .withColumn("n_tokens", size($"toks"))
      .withColumn("stop_ratio",
        size(expr(s"filter(toks, x -> x IN $stop)")).cast("double") / $"n_tokens")
      .filter($"n_tokens" >= 20)

    // 3. language filter (marker-word heuristic, en only).
    // persist: `en` feeds BOTH the LSH candidate build and the final
    // anti-join — without it the whole funnel lineage runs twice. Lazy
    // (no blocking job); swept by Bench/Verify after the query.
    val en = scored.filter(
      size(regexp_extract_all(lower($"text"), lit("\\b(the|a|of|and|is|to)\\b"), lit(0))) >
      size(regexp_extract_all(lower($"text"), lit("\\b(der|die|das|und|le|la|el|los)\\b"), lit(0))))
      .persist()

    // 4. near-dup suppression via MinHash-LSH: id-only band join with the
    //    skew cap, late shingle re-join (Dedup.lshCandidates/verifyJaccard),
    //    then drop the higher doc_id of any confirmed near-dup pair
    val sh = en.select($"doc_id", Dedup.shingles($"toks").as("sh"))
      .persist() // feeds the signature pass and both verify sides (lazily)
    val sigs = sh.select($"doc_id", Dedup.minhashSig($"sh").as("sig"))
    val losers = Dedup.verifyJaccard(Dedup.lshCandidates(sigs), sh, 0.5)
      .select($"id2".as("doc_id")).distinct()

    // 5. curated corpus + provenance
    en.join(losers, Seq("doc_id"), "left_anti")
      .select($"doc_id", $"lang", $"source", $"n_tokens",
        round($"stop_ratio", 4).as("stop_ratio"), $"fp")
      .orderBy($"doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q87_curation_pipeline" -> (curate _))
}
