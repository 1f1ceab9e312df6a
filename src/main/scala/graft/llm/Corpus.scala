package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** Corpus-level curation statistics a pretraining-data pipeline runs
  * between ingest and training: relevance term weighting (TF-IDF),
  * source-mixture rebalancing, and embedding storage quantization.
  * All three are fully relational — hash-graded against the DuckDB
  * oracle like the rest of the catalog — and all three are
  * scan-shaped at 100 TB: one or two key-partitioned aggregations,
  * broadcast side-tables for the scalars, no pairwise blowup anywhere.
  *
  * Reference analogue: the usage-count quality gates (S25,
  * `pulsar.md:635-638`) generalized from "which models/tools get used"
  * to "which terms/sources dominate the corpus".
  */
object Corpus {

  /** q117: per-source top-10 terms by TF-IDF — the corpus-fingerprint
    * report (what vocabulary distinguishes each source) and the
    * weighting primitive behind relevance filters and classifier
    * features. Smoothed idf = ln((N+1)/(df+1)) with df = docs
    * containing the term.
    *
    * Scale shape: two explode→aggregate branches (df by term, tf by
    * (source, term)), equality-joined on term, then a per-source top-k
    * window (Spark plans it as WindowGroupLimit, so the limit prunes
    * before the final sort). The doc-count scalar rides a broadcast
    * 1-row crossJoin, never a driver collect. Both branches carry
    * map-side partial aggregation, so what shuffles is per-partition
    * (term[,source]) partials, not raw tokens. The corpus IS scanned
    * and exploded twice — deliberate: the alternative (persist one
    * exploded (term, doc_id, source) intermediate) materializes a
    * corpus-sized block store at 100 TB, while a second columnar scan
    * of two pruned columns is I/O Spark overlaps with the aggregation
    * CPU. Term-hash shuffles are uniform by construction; the top-k
    * window partitions by source, bounded by the source count. */
  def q117TfIdf(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val terms = docs.select($"doc_id", $"source",
        explode(TextOps.tokens($"text")).as("term"))
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val df = terms.groupBy($"term").agg(countDistinct($"doc_id").as("df"))
    val tf = terms.groupBy($"source", $"term").agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy($"source").orderBy($"score".desc, $"term".asc)
    tf.join(df, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("score",
        round($"tf" * log(($"n_docs" + 1.0) / ($"df" + 1.0)), 4))
      .withColumn("rank", row_number().over(w))
      .filter($"rank" <= 10)
      .select($"source", $"rank".cast("int").as("rank"), $"term", $"score")
      .orderBy($"source", $"rank")
  }

  val q117Sql: String =
    """WITH t AS (
      |  SELECT doc_id, source, unnest(regexp_extract_all(lower(text), '\S+')) AS term
      |  FROM documents),
      |n AS (SELECT count(*) AS n_docs FROM documents),
      |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM t GROUP BY term),
      |tf AS (SELECT source, term, count(*) AS tf FROM t GROUP BY source, term),
      |sc AS (
      |  SELECT tf.source, tf.term,
      |    round(tf.tf * ln((n.n_docs + 1.0) / (df.df + 1.0)), 4) AS score
      |  FROM tf JOIN df USING (term), n),
      |r AS (
      |  SELECT source, term, score,
      |    row_number() OVER (PARTITION BY source ORDER BY score DESC, term ASC) AS rank
      |  FROM sc)
      |SELECT source, CAST(rank AS INT) AS rank, term, score
      |FROM r WHERE rank <= 10 ORDER BY source, rank""".stripMargin

  /** q118: source-mixture rebalancing — downsample every source to the
    * smallest source's size so the training mix is uniform across
    * sources (the "don't let the crawl drown the books" step). The
    * keep decision is a pure function of doc_id (first 6 hex digits of
    * md5 as a fraction of 16^6 compared to the source's keep rate) —
    * no RNG, reproducible across runs AND engines, and the same
    * predicate used as a filter extracts the rebalanced corpus
    * without materializing this report.
    *
    * Scale shape: one count-by-source agg (rows = #sources, broadcast
    * back), then a single narrow scan computing the per-doc hash
    * verdict — no second shuffle. At 100 TB the rates table is bytes,
    * the scan is the cost, and the expected kept fraction per source
    * is exact in distribution (hash uniformity), tested in CorpusSpec. */
  def q118MixtureRebalance(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir).select($"doc_id", $"source", $"n_chars")
    val cnts = docs.groupBy($"source").agg(count(lit(1)).as("cnt"))
    val minC = cnts.agg(min($"cnt").as("min_cnt"))
    val rates = cnts.crossJoin(broadcast(minC))
      .select($"source".as("rsrc"), ($"min_cnt".cast("double") / $"cnt").as("keep_rate"))
    docs.join(broadcast(rates), $"source" === $"rsrc")
      .withColumn("frac",
        conv(substring(md5($"doc_id".cast("string")), 1, 6), 16, 10)
          .cast("long") / lit(16777216.0))
      .withColumn("kept", $"frac" < $"keep_rate")
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"kept", 1L).otherwise(0L)).as("n_kept"),
        round(max($"keep_rate"), 4).as("keep_rate"),
        sum(when($"kept", $"n_chars").otherwise(0L)).as("kept_chars"))
      .orderBy($"source")
  }

  val q118Sql: String =
    """WITH c AS (SELECT source, count(*) AS cnt FROM documents GROUP BY source),
      |m AS (SELECT min(cnt) AS min_cnt FROM c),
      |r AS (SELECT source AS rsrc, CAST(min_cnt AS DOUBLE) / cnt AS keep_rate FROM c, m),
      |k AS (
      |  SELECT d.source, d.n_chars, r.keep_rate,
      |    (('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 6))::BIGINT
      |      / 16777216.0) < r.keep_rate AS kept
      |  FROM documents d JOIN r ON d.source = r.rsrc)
      |SELECT source, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  round(max(keep_rate), 4) AS keep_rate,
      |  CAST(sum(CASE WHEN kept THEN n_chars ELSE 0 END) AS BIGINT) AS kept_chars
      |FROM k GROUP BY source ORDER BY source""".stripMargin

  /** q119: int8 symmetric quantization audit — the storage-side half of
    * the ANN story: absmax scalar quantization (scale = max|x|/127,
    * code = round-half-up(x/scale)) shrinks a float32 embedding store
    * 4× before the IVF/LSH index is built over it. Per vector: the
    * scale, a code checksum, and the worst reconstruction error —
    * the audit a pipeline runs to decide quantization is safe.
    *
    * Purely narrow (no shuffle at all — codegen'd array lambdas over
    * one scan), so it runs at I/O speed over 100 TB. Round-half-up is
    * spelled floor(x/scale + 0.5) in BOTH engines so negative-value
    * rounding and the hash compare agree exactly; a zero vector (legal
    * input, though q37 norms reject them upstream) takes the safe-scale
    * branch and quantizes to all-zero codes instead of dividing by 0. */
  def q119QuantizeAudit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.embeddings(s, dir)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
      .withColumn("scale", array_max(transform($"v", x => abs(x))) / 127.0)
      .withColumn("safe", when($"scale" === 0.0, 1.0).otherwise($"scale"))
      .withColumn("codes", transform($"v", x => floor(x / $"safe" + 0.5)))
      .select($"vec_id",
        size($"v").cast("int").as("dim"),
        round($"scale", 6).as("scale"),
        aggregate($"codes", lit(0L), (a, x) => a + x).as("code_sum"),
        round(array_max(zip_with($"codes", $"v",
          (c, x) => abs(c * $"safe" - x))), 6).as("max_err"))
      .orderBy($"vec_id")
  }

  val q119Sql: String =
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      |s AS (
      |  SELECT vec_id, v,
      |    list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
      |  FROM e),
      |sf AS (
      |  SELECT vec_id, v, scale,
      |    CASE WHEN scale = 0.0 THEN 1.0 ELSE scale END AS safe
      |  FROM s),
      |q AS (
      |  SELECT vec_id, v, scale, safe,
      |    list_transform(v, x -> CAST(floor(x / safe + 0.5) AS BIGINT)) AS codes
      |  FROM sf)
      |SELECT vec_id, CAST(len(v) AS INT) AS dim,
      |  round(scale, 6) AS scale,
      |  CAST(list_sum(codes) AS BIGINT) AS code_sum,
      |  round(list_max([abs(codes[i] * safe - v[i])
      |                  FOR i IN generate_series(1, len(v))]), 6) AS max_err
      |FROM q ORDER BY vec_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q117_tfidf_terms"       -> (q117TfIdf _),
    "q118_mixture_rebalance" -> (q118MixtureRebalance _),
    "q119_quantize_audit"    -> (q119QuantizeAudit _),
  )

  val oracle: Map[String, String] = Map(
    "q117_tfidf_terms"       -> q117Sql,
    "q118_mixture_rebalance" -> q118Sql,
    "q119_quantize_audit"    -> q119Sql,
  )
}
