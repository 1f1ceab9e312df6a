package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Stages 1–3 of the funnel (exact dedup → quality gate → language
    * filter): shared verbatim by the production pipeline (q87) and its
    * oracle twin (q108) — the twin grades THIS composition.
    *
    * persist: the result feeds BOTH the LSH candidate build and the
    * final anti-join — without it the whole funnel lineage runs twice.
    * Lazy (no blocking job); swept by Bench/Verify after the query. */
  private def enCorpus(s: SparkSession, dir: String,
                       sample: Column = lit(true)): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)

    // 1. exact dedup on normalized text (keep the smallest doc_id).
    // `sample` applies directly after this stage: the dedup groupBy must
    // see the whole corpus (min(doc_id) per fingerprint), but the later
    // stages are row-wise, so a doc_id predicate commutes with them —
    // and the persist() below would otherwise stop Catalyst from
    // pushing it past the funnel.
    val fp = docs.withColumn("fp", TextOps.normFp($"text"))
    val keepers = fp.groupBy($"fp").agg(min($"doc_id").as("doc_id"))
    val deduped = fp.join(keepers, Seq("fp", "doc_id")).filter(sample)

    // 2. quality gate — fingerprint and stopword set shared with
    // q33/q32 via TextOps so the funnel cannot drift from the graded
    // single-stage queries
    val scored = deduped
      .withColumn("toks", TextOps.tokens($"text"))
      .withColumn("n_tokens", size($"toks"))
      .withColumn("stop_ratio",
        size(expr(s"filter(toks, x -> x IN ${TextOps.stopSqlList})")).cast("double") / $"n_tokens")
      .filter($"n_tokens" >= 20)

    // 3. language filter (marker-word heuristic, en only)
    scored.filter(
      size(regexp_extract_all(lower($"text"), lit("\\b(the|a|of|and|is|to)\\b"), lit(0))) >
      size(regexp_extract_all(lower($"text"), lit("\\b(der|die|das|und|le|la|el|los)\\b"), lit(0))))
      .persist()
  }

  /** Stage 5: drop the higher doc_id of each confirmed near-dup pair,
    * emit the curated corpus with provenance columns. */
  private def emit(en: DataFrame, losers: DataFrame): DataFrame = {
    val s = en.sparkSession
    import s.implicits._
    en.join(losers, Seq("doc_id"), "left_anti")
      .select($"doc_id", $"lang", $"source", $"n_tokens",
        round($"stop_ratio", 4).as("stop_ratio"), $"fp")
      .orderBy($"doc_id")
  }

  def curate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val en = enCorpus(s, dir)
    // 4. near-dup suppression via MinHash-LSH: id-only band join with the
    //    skew cap, late shingle re-join (Dedup.lshCandidates/verifyJaccard),
    //    then drop the higher doc_id of any confirmed near-dup pair
    val sh = en.select($"doc_id", Dedup.shingles($"toks").as("sh"))
      .persist() // feeds the signature pass and both verify sides (lazily)
    val losers = Dedup.verifyJaccard(Dedup.lshCandidates(Dedup.minhashSigs(sh)), sh, 0.5)
      .select($"id2".as("doc_id")).distinct()
    emit(en, losers)
  }

  /** q108: the full curation funnel with the ORACLE-EXPRESSIBLE md5
    * minhash family (q107's) in stage 4 — every stage restates in
    * DuckDB SQL, so the funnel COMPOSITION (dedup → quality → lang →
    * near-dup anti-join, survivor selection, bucket cap) is hash-graded
    * end to end. q87 stays the production path (xxhash64 signatures);
    * the two share stages 1–3 and 5 verbatim. */
  def q108CurationMd5(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // deterministic 1-in-2 sample (q107's convention): the twin grades
    // the funnel COMPOSITION, not corpus-scale md5 throughput — q87
    // stays the full-corpus path
    val en = enCorpus(s, dir, $"doc_id" % 2 === 0)
    val sh = en.select($"doc_id", Dedup.shingles($"toks").as("sh"))
      .persist() // feeds the signature pass and both verify sides (lazily)
    val losers = Dedup.verifyJaccard(
        Dedup.md5Candidates(sh, Dedup.MaxBucketWidth), sh, 0.5)
      .select($"id2".as("doc_id")).distinct()
    emit(en, losers)
  }

  val q108Sql: String =
    raw"""WITH fp AS (
      |  SELECT doc_id, text, lang, source,
      |         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |  FROM documents),
      |keep AS (SELECT fp, min(doc_id) AS doc_id FROM fp GROUP BY fp),
      |deduped AS (
      |  SELECT f.* FROM fp f JOIN keep k ON f.fp = k.fp AND f.doc_id = k.doc_id),
      |tok AS (
      |  SELECT *, regexp_extract_all(lower(text), '\S+') AS toks FROM deduped),
      |scored AS (
      |  SELECT doc_id, text, lang, source, fp, toks,
      |    CAST(len(toks) AS INT) AS n_tokens,
      |    CAST(len(list_filter(toks, x -> x IN ${TextOps.stopSqlList})) AS DOUBLE)
      |      / len(toks) AS stop_ratio
      |  FROM tok WHERE len(toks) >= 20),
      |en AS (
      |  SELECT * FROM scored
      |  WHERE doc_id % 2 = 0
      |    AND len(regexp_extract_all(lower(text), '\b(the|a|of|and|is|to)\b')) >
      |        len(regexp_extract_all(lower(text), '\b(der|die|das|und|le|la|el|los)\b'))),
      |sh AS (
      |  SELECT doc_id, list_distinct([
      |    concat_ws(' ', toks[i], toks[i+1], toks[i+2])
      |    FOR i IN generate_series(1, greatest(len(toks) - 2, 1))]) AS shs
      |  FROM en),
      |mh AS (
      |  SELECT doc_id,
      |    [ list_min([ ('0x' || substr(md5(CAST(k AS VARCHAR) || '|' || s), 1, 8))::BIGINT
      |                 FOR s IN shs ])
      |      FOR k IN generate_series(0, 7) ] AS sig
      |  FROM sh),
      |banded AS (
      |  SELECT doc_id, b AS band,
      |    CAST(sig[2*b + 1] AS VARCHAR) || ',' || CAST(sig[2*b + 2] AS VARCHAR) AS bkt
      |  FROM mh, unnest(generate_series(0, 3)) AS u(b)),
      |ok AS (
      |  SELECT band, bkt FROM banded GROUP BY band, bkt
      |  HAVING count(*) > 1 AND count(*) <= 64),
      |capped AS (
      |  SELECT banded.* FROM banded JOIN ok USING (band, bkt)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      |  FROM capped a JOIN capped b
      |    ON a.band = b.band AND a.bkt = b.bkt AND a.doc_id < b.doc_id),
      |losers AS (
      |  SELECT DISTINCT c.id2 AS doc_id
      |  FROM cand c
      |  JOIN sh x ON x.doc_id = c.id1
      |  JOIN sh y ON y.doc_id = c.id2
      |  WHERE round(CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE)
      |          / len(list_distinct(list_concat(x.shs, y.shs))), 4) >= 0.5)
      |SELECT e.doc_id, e.lang, e.source, e.n_tokens,
      |       round(e.stop_ratio, 4) AS stop_ratio, e.fp
      |FROM en e
      |WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = e.doc_id)
      |ORDER BY e.doc_id""".stripMargin

  /** q87's oracle (HASH-GRADED since r12): stages 1–3 and 5 restate in
    * SQL exactly as q108's do (shared text verbatim, minus the twin's
    * 1-in-2 sample); stage 4's xxhash64 banding comes from the q46
    * fixture (`fixtures/q46_banded_sf001`) — banding is a PER-DOC
    * function, so restricting the full-corpus fixture to the funnel's
    * survivor set reproduces precisely the band table `lshCandidates`
    * builds over the en corpus, and the width cap / bucket join /
    * Jaccard verify / anti-join replay downstream of it. */
  val q87Sql: String =
    raw"""WITH ${graft.Fixtures.corpusGuardCtes},
      |fp AS (
      |  SELECT doc_id, text, lang, source,
      |         md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |  FROM documents),
      |keep AS (SELECT fp, min(doc_id) AS doc_id FROM fp GROUP BY fp),
      |deduped AS (
      |  SELECT f.* FROM fp f JOIN keep k ON f.fp = k.fp AND f.doc_id = k.doc_id),
      |tok AS (
      |  SELECT *, regexp_extract_all(lower(text), '\S+') AS toks FROM deduped),
      |scored AS (
      |  SELECT doc_id, text, lang, source, fp, toks,
      |    CAST(len(toks) AS INT) AS n_tokens,
      |    CAST(len(list_filter(toks, x -> x IN ${TextOps.stopSqlList})) AS DOUBLE)
      |      / len(toks) AS stop_ratio
      |  FROM tok WHERE len(toks) >= 20),
      |en AS (
      |  SELECT * FROM scored
      |  WHERE len(regexp_extract_all(lower(text), '\b(the|a|of|and|is|to)\b')) >
      |        len(regexp_extract_all(lower(text), '\b(der|die|das|und|le|la|el|los)\b'))),
      |bandf AS (
      |  SELECT b.doc_id, b.band, b.bkt
      |  FROM read_parquet('${graft.Fixtures.dir}/q46_banded_sf001/*.parquet') b
      |  JOIN en e ON e.doc_id = b.doc_id),
      |ok AS (
      |  SELECT band, bkt FROM bandf GROUP BY band, bkt
      |  HAVING count(*) > 1 AND count(*) <= 64),
      |capped AS (
      |  SELECT bandf.* FROM bandf JOIN ok USING (band, bkt)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
      |  FROM capped a JOIN capped b
      |    ON a.band = b.band AND a.bkt = b.bkt AND a.doc_id < b.doc_id),
      |sh AS (
      |  SELECT doc_id, list_distinct([
      |    concat_ws(' ', toks[i], toks[i+1], toks[i+2])
      |    FOR i IN generate_series(1, greatest(len(toks) - 2, 1))]) AS shs
      |  FROM en),
      |losers AS (
      |  SELECT DISTINCT c.id2 AS doc_id
      |  FROM cand c
      |  JOIN sh x ON x.doc_id = c.id1
      |  JOIN sh y ON y.doc_id = c.id2
      |  WHERE round(CAST(len(list_intersect(x.shs, y.shs)) AS DOUBLE)
      |          / len(list_distinct(list_concat(x.shs, y.shs))), 4) >= 0.5)
      |SELECT e.doc_id, e.lang, e.source, e.n_tokens,
      |       round(e.stop_ratio, 4) AS stop_ratio, e.fp
      |FROM en e
      |WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = e.doc_id)
      |UNION ALL
      |SELECT -1, 'FIXTURE_CORPUS_MISMATCH', CAST(n AS VARCHAR),
      |       CAST(-1 AS INT), -1.0, ''
      |FROM fixture_corpus_mismatch WHERE n > 0
      |ORDER BY doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q87_curation_pipeline" -> (curate _),
    "q108_curation_md5"     -> (q108CurationMd5 _))

  val oracle: Map[String, String] = Map(
    "q87_curation_pipeline" -> q87Sql,
    "q108_curation_md5" -> q108Sql)
}
