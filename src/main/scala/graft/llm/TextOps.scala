package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Text-analysis operators for the training-data pipeline (north star;
  * reference embryo: transcript→structured ETL, `agents/
  * output-processor.md:64-95`): tokenization, quality scoring,
  * fingerprinting, language ID, exact dedup, near-dup pairs.
  *
  * Everything is built from codegen'd `functions._` (regexp, higher-order
  * array functions) — no UDFs — so whole-stage codegen covers the hot
  * path and the same logic is expressible in DuckDB for the oracle.
  *
  * Scale: per-document ops are embarrassingly parallel (narrow, no
  * shuffle). The near-dup pair join (q34) buckets by `source` before
  * pairing, which is the LSH-banding shape: at 100 TB you'd band on
  * minhash signatures (see Dedup.scala) instead of a metadata column,
  * but the join geometry — equality on bucket, pairwise inside bucket —
  * is identical.
  */
object TextOps {

  /** The content-identity fingerprint shared by q33, the curation
    * funnel's stage-1 dedup (Pipeline) and the incremental dedup store
    * (Dedup.q122) — ONE definition so the three graded surfaces cannot
    * drift apart. DuckDB restatement:
    * `md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))`. */
  def normFp(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** The quality-gate stopword set, shared by q32 and the curation
    * funnel — the oracle SQL strings interpolate [[stopSqlList]] so the
    * Spark and DuckDB sides move together by construction. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "to", "in", "is", "it", "for")
  val stopSqlList: String = Stopwords.mkString("('", "','", "')")

  /** The whitespace tokenizer every text/dedup operator shares (oracle
    * restatement: `regexp_extract_all(lower(text), '\S+')`) — one
    * Spark-side definition so a tokenization change cannot land in one
    * family and silently desynchronize the others. */
  def tokens(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract_all(lower(text), lit("\\S+"), lit(0))

  /** q29: exact deduplication — hash-groupBy on full text (`dropDuplicates`
    * in keep-first form). Output keyed by content hash. */
  def q29DedupExact(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy(md5($"text").as("h"))
      .agg(min($"doc_id").as("keeper"), count(lit(1)).as("n_copies"))
      .orderBy($"h")
  }

  val q29Sql: String =
    """SELECT md5(text) AS h, min(doc_id) AS keeper, count(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY h""".stripMargin

  /** q30: token counting — whitespace tokens + char stats per document. */
  def q30TokenCount(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id",
        size(regexp_extract_all($"text", lit("\\S+"), lit(0))).as("n_tokens"),
        length($"text").as("len_chars"),
        size(regexp_extract_all($"text", lit("[a-zA-Z]+"), lit(0))).as("n_words"))
      .orderBy($"doc_id")
  }

  val q30Sql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS n_tokens,
      |  CAST(length(text) AS INT) AS len_chars,
      |  CAST(len(regexp_extract_all(text, '[a-zA-Z]+')) AS INT) AS n_words
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q31: corpus rollup per language/source — the lang×source inventory a
    * pipeline curates against. */
  def q31LangStats(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .groupBy($"lang", $"source")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").as("total_chars"),
        round((sum($"n_chars".cast("decimal(18,4)")) / count(lit(1))).cast("double"), 2)
          .as("avg_chars"))
      .orderBy($"lang", $"source")
  }

  val q31Sql: String =
    """SELECT lang, source, count(*) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |       round(CAST(sum(CAST(n_chars AS DECIMAL(18,4))) / count(*) AS DOUBLE), 2) AS avg_chars
      |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin

  /** q32: quality scoring — stopword ratio, mean token length, tier
    * classification (the length/punct/stopword heuristics of a pretraining
    * quality filter). */
  def q32QualityScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("toks", tokens($"text"))
      .withColumn("n_tokens", size($"toks"))
      .withColumn("n_stop", size(expr(s"filter(toks, x -> x IN $stopSqlList)")))
      .withColumn("stop_ratio",
        round($"n_stop".cast("double") / $"n_tokens", 4))
      .withColumn("tier",
        when($"n_tokens" < 20, "too_short")
          .when($"stop_ratio" > 0.05, "fluent")
          .otherwise("raw"))
      .select($"doc_id", $"n_tokens", $"n_stop", $"stop_ratio", $"tier")
      .orderBy($"doc_id")
  }

  val q32Sql: String =
    raw"""SELECT doc_id, n_tokens, n_stop,
      |  round(CAST(n_stop AS DOUBLE) / n_tokens, 4) AS stop_ratio,
      |  CASE WHEN n_tokens < 20 THEN 'too_short'
      |       WHEN round(CAST(n_stop AS DOUBLE) / n_tokens, 4) > 0.05 THEN 'fluent'
      |       ELSE 'raw' END AS tier
      |FROM (
      |  SELECT doc_id,
      |    CAST(len(toks) AS INT) AS n_tokens,
      |    CAST(len(list_filter(toks, x -> x IN $stopSqlList)) AS INT) AS n_stop
      |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
      |        FROM documents) raw) t
      |ORDER BY doc_id""".stripMargin

  /** q33: document fingerprinting — md5 of whitespace-normalized,
    * lowercased text (content-defined identity for dedup across
    * formatting variants). */
  def q33Fingerprint(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"doc_id", normFp($"text").as("fp"))
      .orderBy($"doc_id")
  }

  val q33Sql: String =
    """SELECT doc_id,
      |  md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q34: near-duplicate pairs by word-set Jaccard within a bucket —
    * candidate generation by EXACT prefix filtering (Chaudhuri/Vernica
    * style), verification on the full token sets.
    *
    * Prefix theorem: order every token set by one global canonical
    * order (ascending document frequency, rarest first — ties by
    * token). J(A,B) >= t implies |A∩B| >= ceil(t·|A|) (the union is at
    * least as big as either set), so by pigeonhole a shared token must
    * sit in the first |x| − ceil(t·|x|) + 1 tokens of each side. Only
    * those prefixes join; with t = 0.6 that is ~40% of the tokens, and
    * on a real corpus (Zipfian df) the rarest-first order makes prefix
    * collisions rare — candidate volume collapses. EXACT: no recall
    * loss, proven by the unchanged brute-force oracle still matching.
    * The length-ratio filter (J <= min/max) prunes at the join, also
    * exactly.
    *
    * POSITIONAL filter (PPJoin, Xiao et al. 2008): a joined row knows
    * the shared token's 0-based position p in each side's canonical
    * order, so the overlap can never exceed 1 + min(n1−p1, n2−p2) —
    * and J >= t needs overlap >= t·(n1+n2)/(1+t). Rows below that
    * bound are dropped AT the join. Exact: a truly-matching pair's
    * FIRST shared prefix token has all >= α shared tokens at or after
    * it on both sides, so that row always passes and `distinct` keeps
    * the pair. Measured at sf0.1 (narrow 6–31 token lengths, where the
    * length-ratio filter alone removes only ~12% of joined rows): this
    * bound cuts distinct candidates ~489k → far fewer, and
    * verification cost follows candidates. This is the 100 TB shape:
    * df is a tiny broadcast table, the prefix join shuffles by token,
    * verification touches only candidate pairs. */
  def q34JaccardPairs(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val t = 0.6
    // Candidate generation must be derived from the threshold the
    // VERIFICATION actually applies: the final filter accepts
    // round(J, 4) >= 0.6, i.e. true J >= 0.59995 — pruning with a bare
    // 0.6 would let a pair in the [0.59995, 0.6) rounding window pass
    // the oracle but lose its prefix/length-ratio guarantee here.
    val tGen = t - 0.5e-4
    val docs = graft.Tables.spread(Tables.documents(s, dir), "doc_id")
      // the SHARED tokenizer (tokens) — q34's token domain must move in
      // lockstep with every other tokenizing query and its oracle SQL
      .select($"doc_id", $"source", array_distinct(tokens($"text")).as("toks"))
      .withColumn("n", size($"toks"))
      .persist() // tokenization read 3×: dfreq, ordered, both verify sides
    // global document frequency — the canonical order (vocabulary-sized)
    val dfreq = docs.select(explode($"toks").as("tok"))
      .groupBy($"tok").agg(count(lit(1)).as("df"))
    val ordered = docs
      .select($"source", $"doc_id", $"n", explode($"toks").as("tok"))
      .join(broadcast(dfreq), Seq("tok"))
      .groupBy($"source", $"doc_id", $"n")
      .agg(array_sort(collect_list(struct($"df", $"tok"))).as("ord"))
      .withColumn("plen", ($"n" - ceil($"n" * tGen) + 1).cast("int"))
      .select($"source", $"doc_id", $"n",
        posexplode(transform(slice($"ord", lit(1), $"plen"), p => p("tok")))
          .as(Seq("p", "tok")))
      .persist() // read twice: both sides of the prefix self-join
    val a = ordered.select($"source", $"doc_id".as("id1"), $"n".as("n1"),
      $"p".as("p1"), $"tok")
    val b = ordered.select($"source".as("s2"), $"doc_id".as("id2"), $"n".as("n2"),
      $"p".as("p2"), $"tok".as("tok2"))
    val cand = a.join(b, $"source" === $"s2" && $"tok" === $"tok2" && $"id1" < $"id2" &&
        least($"n1", $"n2") >= lit(tGen) * greatest($"n1", $"n2") &&
        // positional upper bound on the achievable overlap (see scaladoc)
        (lit(1.0) + least($"n1" - $"p1", $"n2" - $"p2")) >=
          lit(tGen / (1 + tGen)) * ($"n1" + $"n2"))
      .select($"id1", $"id2").distinct()
    // verification kernel: one sorted-merge count per pair (codegen,
    // allocation-free) instead of size(array_intersect) — the arrays
    // are sorted ONCE per doc, the count runs once per candidate pair
    val full = docs.select($"doc_id", array_sort($"toks").as("toks"))
    cand
      .join(full.select($"doc_id".as("id1"), $"toks".as("t1")), Seq("id1"))
      .join(full.select($"doc_id".as("id2"), $"toks".as("t2")), Seq("id2"))
      .withColumn("shared",
        graft.functions.SortedOverlapCount.overlap(s, $"t1", $"t2"))
      .withColumn("jaccard",
        round($"shared".cast("double") / (size($"t1") + size($"t2") - $"shared"), 4))
      .filter($"jaccard" >= t)
      .select($"id1", $"id2", $"jaccard")
      .orderBy($"id1", $"id2")
  }

  val q34Sql: String =
    """WITH d AS (
      |  SELECT doc_id, source,
      |         list_distinct(regexp_extract_all(lower(text), '\S+')) AS toks
      |  FROM documents)
      |SELECT a.doc_id AS id1, b.doc_id AS id2,
      |  round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      |        / len(list_distinct(list_concat(a.toks, b.toks))), 4) AS jaccard
      |FROM d a JOIN d b ON a.source = b.source AND a.doc_id < b.doc_id
      |WHERE round(CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
      |        / len(list_distinct(list_concat(a.toks, b.toks))), 4) >= 0.6
      |ORDER BY id1, id2""".stripMargin

  /** q35: language identification — stopword-profile n-gram heuristic:
    * count marker-word hits per language, argmax with deterministic
    * precedence (en last as fallback). */
  def q35LangId(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    def hits(markers: String) =
      size(regexp_extract_all(lower($"text"), lit(s"\\b($markers)\\b"), lit(0)))
    Tables.documents(s, dir)
      .withColumn("c_de", hits("der|die|das|und|nicht|ist"))
      .withColumn("c_fr", hits("le|la|les|et|est|une"))
      .withColumn("c_es", hits("el|los|las|es|una|y"))
      .withColumn("c_en", hits("the|a|of|and|is|to"))
      .withColumn("guess",
        when($"c_de" > $"c_en" && $"c_de" > $"c_fr" && $"c_de" > $"c_es", "de")
          .when($"c_fr" > $"c_en" && $"c_fr" >= $"c_de" && $"c_fr" > $"c_es", "fr")
          .when($"c_es" > $"c_en" && $"c_es" >= $"c_de" && $"c_es" >= $"c_fr", "es")
          .otherwise("en"))
      .select($"doc_id", $"c_de", $"c_fr", $"c_es", $"c_en", $"guess")
      .orderBy($"doc_id")
  }

  val q35Sql: String =
    """SELECT doc_id, c_de, c_fr, c_es, c_en,
      |  CASE WHEN c_de > c_en AND c_de > c_fr AND c_de > c_es THEN 'de'
      |       WHEN c_fr > c_en AND c_fr >= c_de AND c_fr > c_es THEN 'fr'
      |       WHEN c_es > c_en AND c_es >= c_de AND c_es >= c_fr THEN 'es'
      |       ELSE 'en' END AS guess
      |FROM (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(lower(text), '\b(der|die|das|und|nicht|ist)\b')) AS INT) AS c_de,
      |    CAST(len(regexp_extract_all(lower(text), '\b(le|la|les|et|est|une)\b')) AS INT) AS c_fr,
      |    CAST(len(regexp_extract_all(lower(text), '\b(el|los|las|es|una|y)\b')) AS INT) AS c_es,
      |    CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|is|to)\b')) AS INT) AS c_en
      |  FROM documents) t
      |ORDER BY doc_id""".stripMargin

  /** q67: BPE-ish tokenization — the GPT-2 pre-tokenizer regex shape
    * (contractions, space-prefixed letter runs, digit runs, punctuation
    * runs, whitespace); counts per document next to whitespace tokens.
    * Pure RE2-compatible alternation, so DuckDB evaluates it identically. */
  def q67BpeTokens(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bpe = "'(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\\sa-zA-Z0-9]+|\\s+"
    Tables.documents(s, dir)
      .select($"doc_id",
        size(regexp_extract_all($"text", lit(bpe), lit(0))).as("n_bpe"),
        size(regexp_extract_all($"text", lit("\\S+"), lit(0))).as("n_ws"),
        size(array_distinct(regexp_extract_all($"text", lit(bpe), lit(0))))
          .as("n_bpe_distinct"))
      .orderBy($"doc_id")
  }

  val q67Sql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+')) AS INT) AS n_bpe,
      |  CAST(len(regexp_extract_all(text, '\S+')) AS INT) AS n_ws,
      |  CAST(len(list_distinct(regexp_extract_all(text, '''(?:s|t|re|ve|m|ll|d)| ?[a-zA-Z]+| ?[0-9]+| ?[^\sa-zA-Z0-9]+|\s+'))) AS INT) AS n_bpe_distinct
      |FROM documents ORDER BY doc_id""".stripMargin

  /** q100: deterministic train/val/test split — the reproducible-split
    * primitive a training pipeline needs: assignment is a pure function
    * of doc_id (first hex digit of md5), no RNG, no seed drift between
    * runs or engines; ~75/12.5/12.5. At 100 TB this is a narrow
    * projection + aggregation, and the same expression used as a filter
    * extracts any one split without materializing the others. */
  def q100DataSplit(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("bucket", substring(md5($"doc_id".cast("string")), 1, 1))
      .withColumn("split",
        when($"bucket".isin("c", "d"), "val")
          .when($"bucket".isin("e", "f"), "test")
          .otherwise("train"))
      .groupBy($"split")
      .agg(count(lit(1)).as("n_docs"),
        sum($"n_chars").as("total_chars"),
        countDistinct($"source").as("n_sources"))
      .orderBy($"split")
  }

  val q100Sql: String =
    """SELECT
      |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d') THEN 'val'
      |       WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e','f') THEN 'test'
      |       ELSE 'train' END AS split,
      |  count(*) AS n_docs,
      |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
      |  count(DISTINCT source) AS n_sources
      |FROM documents GROUP BY 1 ORDER BY split""".stripMargin

  /** q101: benchmark decontamination — training docs sharing 3-gram
    * shingles with a held-out "benchmark" slice (source = src0), with
    * the shared-shingle count as contamination evidence. The join is an
    * equality join on the shingle (shuffle-partitioned by shingle hash);
    * the benchmark side is the small one and broadcastable at scale. */
  def q101Decontamination(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = Dedup.docShingles(s, dir) // shared exploded build (r13)
    val bench = sh.filter($"source" === "src0").select($"sh".as("bsh")).distinct()
    sh.filter($"source" =!= "src0")
      .join(broadcast(bench), $"sh" === $"bsh")
      .groupBy($"doc_id")
      .agg(countDistinct($"sh").as("n_shared"))
      .orderBy($"doc_id")
  }

  val q101Sql: String =
    """WITH sh AS (
      |  SELECT doc_id, source, unnest(list_distinct([
      |    concat_ws(' ', toks[i], toks[i+1], toks[i+2])
      |    FOR i IN generate_series(1, greatest(len(toks) - 2, 1))])) AS sh
      |  FROM (SELECT doc_id, source, regexp_extract_all(lower(text), '\S+') AS toks
      |        FROM documents) t)
      |SELECT a.doc_id, count(DISTINCT a.sh) AS n_shared
      |FROM sh a JOIN (SELECT DISTINCT sh FROM sh WHERE source = 'src0') b
      |  ON a.sh = b.sh
      |WHERE a.source <> 'src0'
      |GROUP BY a.doc_id ORDER BY a.doc_id""".stripMargin

  /** q245: CROSS-SPLIT MEMORIZATION SCAN — the verbatim-overlap metric
    * of the published train/test-leakage studies (Lee et al. 2022 §6.2
    * dedup-vs-memorization, arXiv:2107.06499; Carlini et al. 2023
    * "Quantifying Memorization", arXiv:2202.07646 — both measure
    * verbatim ~50-token / k-gram reproduction; the eval-side standard
    * is 13-gram containment, e.g. GPT-3's decontamination appendix):
    * for every VAL-split document (q100's deterministic md5 rule), how
    * many of its 13-token windows appear verbatim anywhere in the
    * TRAIN split. This is the number an eval team must know before
    * trusting a held-out metric — q242's probe eval found in-sample
    * inflation from memorized signal; this query measures the
    * leak surface itself, doc by doc.
    *
    * Output per val doc: exact window counts (n_grams, n_memorized,
    * n_distinct_mem), the contamination fraction in exact
    * parts-per-million (integer division — cross-engine-safe at any
    * scale), and the leaked flag. 100 TB shape: one narrow window scan
    * per side, the train grams distinct-reduced (hash-partitioned,
    * map-side partial), one equality join keyed by the gram — textual
    * HERE so the oracle restates it verbatim; q248 registers the
    * xxhash64-keyed production form whose shuffles carry 8-byte longs
    * — q101's decontamination geometry with the split as the boundary
    * instead of the benchmark source. */
  def q245MemorizationScan(s: SparkSession, dir: String): DataFrame =
    memorizationScanFrom(Tables.documents(s, dir))

  /** (doc_id, g) 13-token gram windows of an arbitrary (doc_id, text)
    * frame — THE gram definition of the decontamination/memorization
    * family (the 13-gram verbatim-containment standard): one shared
    * window front end feeds q245/q248 (via [[splitGramWindows]]), the
    * q258 batch decontamination scan, the streaming
    * `Streams.decontamIngest`, and the q248 oracle fixture, so every
    * consumer sees bit-identical gram strings by construction. Pure
    * narrow projection + explode — no shuffle until a consumer keys
    * on the gram. */
  def gramWindows(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val W = 13
    // spread before tokenize+window (optimization r19, guide §2.5): the
    // 13-gram build is the family's dominant narrow cost and otherwise
    // runs inside the single-split scan's one task (no-op for streaming
    // micro-batches and already-wide frames)
    graft.Tables.spread(docs, "doc_id")
      .select($"doc_id", tokens($"text").as("toks"))
      .filter(size($"toks") >= W)
      .select($"doc_id", explode(transform(
        sequence(lit(1), size($"toks") - (W - 1)),
        i => concat_ws(" ", slice($"toks", i, lit(W))))).as("g"))
  }

  /** (doc_id, sb, g) 13-token gram windows with the q100 split bucket —
    * [[gramWindows]] plus the split label, the shared front end of
    * q245 (textual keys), q248 (xxhash64 keys) and the q248 oracle
    * fixture. The bucket is re-derived map-side from doc_id after the
    * explode (a hash of a short string per gram row — the same
    * per-row cost class as the xxhash64 the production form pays
    * anyway), keeping ONE window definition for the whole family. */
  def splitGramWindows(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    gramWindows(docs)
      .select($"doc_id",
        substring(md5($"doc_id".cast("string")), 1, 1).as("sb"), $"g")
  }

  /** q245's engine on an arbitrary (doc_id, text) frame — split out so
    * LlmSpec can pin exact window counts on constructed leaks. */
  def memorizationScanFrom(docs: DataFrame): DataFrame =
    memorizationScanKeyed(splitGramWindows(docs).withColumnRenamed("g", "k"))

  /** q248's engine: identical plan, but the gram key that feeds the
    * train-side distinct and the val-side join is `xxhash64(gram)` —
    * computed map-side in the window projection, so the shuffles carry
    * 8-byte longs instead of ~13-token strings. */
  def memorizationScanHashedFrom(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    memorizationScanKeyed(
      splitGramWindows(docs).select($"doc_id", $"sb", xxhash64($"g").as("k")))
  }

  /** Shared back end of q245/q248: train-distinct, val left join, exact
    * window counts + integer ppm. `grams` = (doc_id, sb, k) where k is
    * whatever key identifies a 13-token window (text or hash). */
  private def memorizationScanKeyed(grams: DataFrame): DataFrame = {
    val s = grams.sparkSession
    import s.implicits._
    val trn = grams.filter(!$"sb".isin("c", "d", "e", "f"))
      .select($"k".as("tk")).distinct()
    grams.filter($"sb".isin("c", "d"))
      .join(trn, $"k" === $"tk", "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"tk".isNotNull, 1L).otherwise(0L)).as("n_memorized"),
        countDistinct(when($"tk".isNotNull, $"k")).as("n_distinct_mem"))
      .select($"doc_id", $"n_grams", $"n_memorized", $"n_distinct_mem",
        expr("CAST((n_memorized * 1000000) div n_grams AS BIGINT)").as("mem_ppm"),
        ($"n_memorized" > 0).as("leaked"))
      .orderBy($"doc_id")
  }

  val q245Sql: String = {
    val terms = (0 until 13).map(i => s"toks[i+$i]").mkString(", ")
    raw"""WITH tk AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks,
      |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS sb
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, sb,
      |    unnest([concat_ws(' ', $terms)
      |            FOR i IN generate_series(1, len(toks) - 12)]) AS g
      |  FROM tk WHERE len(toks) >= 13),
      |trn AS (SELECT DISTINCT g AS tg FROM g WHERE sb NOT IN ('c','d','e','f')),
      |v AS (SELECT doc_id, g, tg FROM g LEFT JOIN trn ON tg = g
      |      WHERE sb IN ('c','d'))
      |SELECT doc_id,
      |  count(*) AS n_grams,
      |  CAST(sum(CASE WHEN tg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_memorized,
      |  count(DISTINCT CASE WHEN tg IS NOT NULL THEN g END) AS n_distinct_mem,
      |  CAST(sum(CASE WHEN tg IS NOT NULL THEN 1 ELSE 0 END) * 1000000
      |       // count(*) AS BIGINT) AS mem_ppm,
      |  sum(CASE WHEN tg IS NOT NULL THEN 1 ELSE 0 END) > 0 AS leaked
      |FROM v GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** q248: q245's PRODUCTION form (VERDICT r15 item 1) — the cross-split
    * memorization scan with the train-distinct and the val join keyed by
    * `xxhash64(gram)` instead of the 13-token string. q245 shuffles the
    * full ~80–130-byte gram twice; here the hash is computed in the
    * window projection, so only (doc_id, sb, h:long) reaches an
    * exchange (~6× fewer shuffled bytes at the measured gram widths).
    * Same published regime (13-gram verbatim containment; Lee et al.
    * arXiv:2107.06499 §6.2, Carlini et al. arXiv:2202.07646).
    *
    * HASH-GRADED via the q46/q48 fixture discipline:
    * `fixtures/q248_gramhash_sf001` commits the distinct gram→hash
    * vocabulary (generated THROUGH [[splitGramWindows]] + the same
    * `xxhash64` column; FixtureDriftSpec regenerates and compares), and
    * the oracle rebuilds the grams textually from the LIVE corpus, maps
    * each through the committed vocabulary, and replays the split
    * boundary, the train distinct, the val join, and the exact integer
    * ppm on the hash key. Both engines consume the SAME hash values, so
    * the grade is exact even under a collision. LlmSpec pins
    * q248 ≡ q245 row-for-row on the sf0.01 corpus. */
  def q248MemorizationHashed(s: SparkSession, dir: String): DataFrame =
    memorizationScanHashedFrom(Tables.documents(s, dir))

  val q248Sql: String = {
    val terms = (0 until 13).map(i => s"toks[i+$i]").mkString(", ")
    raw"""WITH ${graft.Fixtures.corpusGuardCtes},
      |hx AS (
      |  SELECT g, h
      |  FROM read_parquet('${graft.Fixtures.dir}/q248_gramhash_sf001/*.parquet')),
      |tk AS (
      |  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks,
      |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS sb
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, sb,
      |    unnest([concat_ws(' ', $terms)
      |            FOR i IN generate_series(1, len(toks) - 12)]) AS g
      |  FROM tk WHERE len(toks) >= 13),
      |gh AS (SELECT g.doc_id, g.sb, hx.h FROM g JOIN hx USING (g)),
      |trn AS (SELECT DISTINCT h AS th FROM gh WHERE sb NOT IN ('c','d','e','f')),
      |v AS (SELECT doc_id, h, th FROM gh LEFT JOIN trn ON th = h
      |      WHERE sb IN ('c','d'))
      |SELECT doc_id,
      |  count(*) AS n_grams,
      |  CAST(sum(CASE WHEN th IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_memorized,
      |  count(DISTINCT CASE WHEN th IS NOT NULL THEN h END) AS n_distinct_mem,
      |  CAST(sum(CASE WHEN th IS NOT NULL THEN 1 ELSE 0 END) * 1000000
      |       // count(*) AS BIGINT) AS mem_ppm,
      |  sum(CASE WHEN th IS NOT NULL THEN 1 ELSE 0 END) > 0 AS leaked
      |FROM v GROUP BY doc_id
      |UNION ALL
      |SELECT -1, n, CAST(-1 AS BIGINT), -1, CAST(-1 AS BIGINT), FALSE
      |FROM fixture_corpus_mismatch WHERE n > 0
      |ORDER BY doc_id""".stripMargin
  }

  /** q258: BENCHMARK DECONTAMINATION SCAN, hash-keyed — q101's
    * decontamination question asked at the 13-gram containment
    * standard on q248's 8-byte keys (VERDICT r16 item 4's batch twin):
    * for every training-candidate document (source ≠ src0), how many
    * of its 13-token windows appear verbatim in the BENCHMARK slice
    * (source = src0) — exact window counts, contamination in exact
    * integer ppm, and the gate verdict. q245/q248 measure leakage
    * across the pipeline's own split; this is the EXTERNAL-benchmark
    * gate (the GPT-3 decontamination appendix's 13-gram rule) that
    * [[graft.streaming.Streams.decontamIngest]] applies per
    * micro-batch — one scan definition, batch and streaming consumers.
    *
    * Shape: the shared [[gramWindows]] front end, xxhash64 computed
    * map-side so shuffles carry (doc_id, h:long); the benchmark's
    * distinct gram-hash set is the SMALL side and broadcast (q101's
    * geometry — at 100 TB the benchmark suite is MBs against a corpus
    * of TBs, so the candidate side never shuffles at all: scan →
    * hash → broadcast-join → partial agg). HASH-GRADED via the
    * committed q248 gram→hash vocabulary (the fixture covers ALL
    * distinct corpus grams, benchmark included — one vocabulary, two
    * graded consumers): the oracle rebuilds grams textually, maps both
    * sides through the fixture, and replays containment on the hash
    * key, so both engines consume identical hashes and the grade
    * survives even a collision. */
  def q258DecontamScan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    decontamScanFrom(docs.filter($"source" =!= "src0"),
      docs.filter($"source" === "src0"))
  }

  /** q258's engine on arbitrary (doc_id, text) frames — split out so
    * LlmSpec can pin exact hit counts on constructed contamination and
    * `Streams.decontamIngest` can run it per micro-batch. Returns one
    * row per candidate doc with ≥ 1 gram window (shorter docs carry no
    * 13-gram surface; the INGEST wrapper re-adds them as clean). */
  def decontamScanFrom(candidates: DataFrame, benchmark: DataFrame): DataFrame = {
    val s = candidates.sparkSession
    import s.implicits._
    val bench = gramWindows(benchmark)
      .select(xxhash64($"g").as("bh")).distinct()
    gramWindows(candidates)
      .select($"doc_id", xxhash64($"g").as("h"))
      .join(broadcast(bench), $"h" === $"bh", "left")
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when($"bh".isNotNull, 1L).otherwise(0L)).as("n_hits"),
        countDistinct(when($"bh".isNotNull, $"h")).as("n_distinct_hits"))
      .select($"doc_id", $"n_grams", $"n_hits", $"n_distinct_hits",
        expr("CAST((n_hits * 1000000) div n_grams AS BIGINT)").as("contam_ppm"),
        ($"n_hits" > 0).as("contaminated"))
      .orderBy($"doc_id")
  }

  val q258Sql: String = {
    val terms = (0 until 13).map(i => s"toks[i+$i]").mkString(", ")
    raw"""WITH ${graft.Fixtures.corpusGuardCtes},
      |hx AS (
      |  SELECT g, h
      |  FROM read_parquet('${graft.Fixtures.dir}/q248_gramhash_sf001/*.parquet')),
      |tk AS (
      |  SELECT doc_id, source, regexp_extract_all(lower(text), '\S+') AS toks
      |  FROM documents),
      |g AS (
      |  SELECT doc_id, source,
      |    unnest([concat_ws(' ', $terms)
      |            FOR i IN generate_series(1, len(toks) - 12)]) AS g
      |  FROM tk WHERE len(toks) >= 13),
      |gh AS (SELECT g.doc_id, g.source, hx.h FROM g JOIN hx USING (g)),
      |bench AS (SELECT DISTINCT h AS bh FROM gh WHERE source = 'src0'),
      |v AS (SELECT doc_id, h, bh FROM gh LEFT JOIN bench ON bh = h
      |      WHERE source <> 'src0')
      |SELECT doc_id,
      |  count(*) AS n_grams,
      |  CAST(sum(CASE WHEN bh IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hits,
      |  count(DISTINCT CASE WHEN bh IS NOT NULL THEN h END) AS n_distinct_hits,
      |  CAST(sum(CASE WHEN bh IS NOT NULL THEN 1 ELSE 0 END) * 1000000
      |       // count(*) AS BIGINT) AS contam_ppm,
      |  sum(CASE WHEN bh IS NOT NULL THEN 1 ELSE 0 END) > 0 AS contaminated
      |FROM v GROUP BY doc_id
      |UNION ALL
      |SELECT -1, n, CAST(-1 AS BIGINT), -1, CAST(-1 AS BIGINT), FALSE
      |FROM fixture_corpus_mismatch WHERE n > 0
      |ORDER BY doc_id""".stripMargin
  }

  /** q102: overlapping token-window chunking — the context-window prep
    * step of an LLM ingest pipeline: chunks of `C` tokens every `S`
    * (overlap C−S), with the token offset kept for provenance. Pure
    * narrow projection + explode: no shuffle at all until a consumer
    * aggregates, so it streams at scan speed over 100 TB. */
  def q102Chunking(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val C = 10
    val S = 8
    Tables.documents(s, dir)
      .select($"doc_id",
        regexp_extract_all($"text", lit("\\S+"), lit(0)).as("toks"))
      .withColumn("n", size($"toks"))
      .withColumn("n_chunks",
        (ceil(greatest($"n" - C, lit(0)).cast("double") / S) + 1).cast("int"))
      .select($"doc_id", $"toks",
        explode(sequence(lit(0), $"n_chunks" - 1)).as("chunk_idx"))
      .withColumn("token_start", ($"chunk_idx" * S + 1).cast("int"))
      .withColumn("chunk", slice($"toks", $"token_start", lit(C)))
      .select($"doc_id", $"chunk_idx", $"token_start",
        size($"chunk").as("n_tokens"),
        concat_ws(" ", $"chunk").as("chunk_text"))
      .orderBy($"doc_id", $"chunk_idx")
  }

  val q102Sql: String =
    """WITH c AS (
      |  SELECT doc_id, regexp_extract_all(text, '\S+') AS toks,
      |    CAST(ceil(greatest(len(regexp_extract_all(text, '\S+')) - 10, 0) / 8.0) + 1 AS INT)
      |      AS n_chunks
      |  FROM documents)
      |SELECT doc_id, CAST(ci AS INT) AS chunk_idx,
      |  CAST(ci * 8 + 1 AS INT) AS token_start,
      |  CAST(len(toks[ci*8+1 : ci*8+10]) AS INT) AS n_tokens,
      |  array_to_string(toks[ci*8+1 : ci*8+10], ' ') AS chunk_text
      |FROM c, unnest(generate_series(0, n_chunks - 1)) AS u(ci)
      |ORDER BY doc_id, chunk_idx""".stripMargin

  /** q103: PII scrubbing — email/phone detection + redaction counts, the
    * compliance pass a corpus runs before training. PII is injected
    * deterministically (the synthetic corpus has none), both engines
    * scrub the SAME strings; the redacted text is md5'd so the full
    * replacement output is hash-graded without shipping long strings. */
  def q103PiiRedaction(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phoneRe = "\\b\\d{3}-\\d{4}\\b"
    Tables.documents(s, dir)
      .select($"doc_id",
        concat($"text",
          when($"doc_id" % 3 === 0,
            concat(lit(" contact user"), ($"doc_id" % 50).cast("string"),
              lit("@example.com now"))).otherwise(""),
          when($"doc_id" % 4 === 0,
            concat(lit(" call 555-01"), lpad(($"doc_id" % 100).cast("string"), 2, "0")))
            .otherwise("")).as("raw"))
      .select($"doc_id",
        size(regexp_extract_all($"raw", lit(emailRe), lit(0))).as("n_emails"),
        size(regexp_extract_all($"raw", lit(phoneRe), lit(0))).as("n_phones"),
        md5(regexp_replace(regexp_replace($"raw", emailRe, "[EMAIL]"),
          phoneRe, "[PHONE]")).as("redacted_md5"))
      .orderBy($"doc_id")
  }

  val q103Sql: String =
    """WITH r AS (
      |  SELECT doc_id, concat(text,
      |    CASE WHEN doc_id % 3 = 0
      |         THEN concat(' contact user', CAST(doc_id % 50 AS VARCHAR), '@example.com now')
      |         ELSE '' END,
      |    CASE WHEN doc_id % 4 = 0
      |         THEN concat(' call 555-01', lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0'))
      |         ELSE '' END) AS raw
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(raw, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
      |  CAST(len(regexp_extract_all(raw, '\b\d{3}-\d{4}\b')) AS INT) AS n_phones,
      |  md5(regexp_replace(regexp_replace(raw,
      |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
      |    '\b\d{3}-\d{4}\b', '[PHONE]', 'g')) AS redacted_md5
      |FROM r ORDER BY doc_id""".stripMargin

  /** q115: repetition / boilerplate detection — the duplicate-n-gram
    * quality filter every pretraining corpus pipeline runs (the
    * Gopher/C4-style "fraction of duplicated 3-grams" rule): documents
    * dominated by repeated phrasing (templated pages, scraper echo,
    * keyword stuffing) get flagged before they poison dedup and
    * training. Per doc: total trigrams, duplicate-trigram fraction
    * (1 − distinct/total), top-trigram share, and the boilerplate flag.
    * One narrow scan → explode → two hash aggregations by doc — fully
    * distributed, no driver state; at 100 TB the trigram explode is
    * ~sequence-length×, the same shape q46's shingling already proves
    * out. Docs under 3 tokens carry no trigram signal and drop.
    *
    * Trigram construction is `zip_with` over three shifted `slice`s of
    * the token array — measured 10× faster than the indexed-lambda
    * `transform(sequence(…), i -> toks[i-1] …)` formulation (0.8 s vs
    * 7.7 s at sf0.1): per-element array indexing inside a higher-order
    * lambda pays interpreted GetArrayItem per access, while slice+zip
    * walks each array once. */
  def q115Repetition(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .withColumn("toks", tokens($"text"))
      .filter(size($"toks") >= 3)
      .withColumn("grams", expr(
        "zip_with(slice(toks, 1, size(toks) - 2), " +
          "zip_with(slice(toks, 2, size(toks) - 2), slice(toks, 3, size(toks) - 2), " +
          "(b, c) -> concat(b, ' ', c)), (a, bc) -> concat(a, ' ', bc))"))
      .select($"doc_id", explode($"grams").as("g"))
      .groupBy($"doc_id", $"g").agg(count(lit(1)).as("c"))
      .groupBy($"doc_id")
      .agg(sum($"c").as("n_grams"), count(lit(1)).as("n_distinct"),
        max($"c").as("top_count"))
      .select($"doc_id",
        $"n_grams".cast("int").as("n_grams"),
        round(lit(1.0) - $"n_distinct".cast("double") / $"n_grams", 4).as("dup_frac"),
        round($"top_count".cast("double") / $"n_grams", 4).as("top_frac"),
        (round(lit(1.0) - $"n_distinct".cast("double") / $"n_grams", 4) > 0.2)
          .as("boilerplate"))
      .orderBy($"doc_id")
  }

  val q115Sql: String =
    """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks FROM documents),
      |g AS (
      |  SELECT doc_id,
      |    unnest([concat_ws(' ', toks[i], toks[i+1], toks[i+2])
      |            FOR i IN generate_series(1, len(toks) - 2)]) AS g
      |  FROM t WHERE len(toks) >= 3),
      |c AS (SELECT doc_id, g, count(*) AS c FROM g GROUP BY doc_id, g),
      |a AS (SELECT doc_id, CAST(sum(c) AS INT) AS n_grams,
      |        count(*) AS n_distinct, max(c) AS top_count
      |      FROM c GROUP BY doc_id)
      |SELECT doc_id, n_grams,
      |  round(1.0 - CAST(n_distinct AS DOUBLE) / n_grams, 4) AS dup_frac,
      |  round(CAST(top_count AS DOUBLE) / n_grams, 4) AS top_frac,
      |  round(1.0 - CAST(n_distinct AS DOUBLE) / n_grams, 4) > 0.2 AS boilerplate
      |FROM a ORDER BY doc_id""".stripMargin

  /** q116: sequence packing — assemble documents into token-budgeted
    * training packs (the step between curation and the trainer: group
    * docs so each pack holds ~`budget` tokens). Streaming-greedy
    * assignment: a doc's pack is `floor(tokens-before-it / budget)`
    * within its shard, so packs fill to the budget and the straddling
    * doc overflows into position 1 of the next — the standard
    * approximation real pipelines use, deterministic and
    * window-expressible.
    *
    * Scale shape: packing is a running sum, which is inherently
    * sequential — so it runs PER SHARD (hash of doc_id), one window
    * partition each, embarrassingly parallel across shards. A single
    * global ordering would serialize 100 TB through one partition; the
    * shard is the unit a trainer consumes anyway. */
  def q116SeqPacking(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val budget = 512
    val w = Window.partitionBy($"shard").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, dir)
      .select($"doc_id", pmod($"doc_id", lit(8)).as("shard"),
        size(tokens($"text")).as("n_tok"))
      .withColumn("cum_before", coalesce(sum($"n_tok").over(w), lit(0L)))
      .withColumn("pack_id", floor($"cum_before" / budget).cast("int"))
      .groupBy($"shard", $"pack_id")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"),
        min($"doc_id").as("first_doc"), max($"doc_id").as("last_doc"))
      .orderBy($"shard", $"pack_id")
  }

  val q116Sql: String =
    """WITH d AS (
      |  SELECT doc_id, doc_id % 8 AS shard,
      |    CAST(len(regexp_extract_all(lower(text), '\S+')) AS BIGINT) AS n_tok
      |  FROM documents),
      |p AS (
      |  SELECT doc_id, shard, n_tok,
      |    CAST(floor(coalesce(sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / 512.0) AS INT) AS pack_id
      |  FROM d)
      |SELECT shard, pack_id, count(*) AS n_docs,
      |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
      |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
      |FROM p GROUP BY shard, pack_id ORDER BY shard, pack_id""".stripMargin

  /** q160: distribution-relative quality filtering — the C4-style
    * curation gate that keeps the middle of the quality DISTRIBUTION
    * rather than applying a fixed threshold (fixed thresholds drift as
    * the corpus mix changes; percentile bands do not): per language,
    * docs rank by stop-ratio (q32's fluency proxy) under percent_rank,
    * and the band [0.1, 0.9] survives — trimming both the stopword-free
    * junk tail and the stopword-saturated boilerplate tail.
    *
    * Determinism: percent_rank is (rank−1)/(n−1) — exact integer
    * arithmetic over a total order (ratio, doc_id) → identical doubles
    * in both engines. Scale: one per-language window sort; at 100 TB
    * the band EDGES come from the mergeable quantile sketch instead
    * (q139's contract) and the filter becomes a narrow scan against
    * two broadcast thresholds — the exact window form is kept here
    * because it is what the oracle can grade bit-for-bit. */
  def q160QualityBand(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = Tables.documents(s, dir)
      .withColumn("toks", tokens($"text"))
      .withColumn("n_tokens", size($"toks"))
      .withColumn("n_stop", size(expr(s"filter(toks, x -> x IN $stopSqlList)")))
      .withColumn("ratio", round($"n_stop".cast("double") / $"n_tokens", 6))
      .withColumn("pr", percent_rank().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy($"lang").orderBy($"ratio", $"doc_id")))
    scored
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(when($"pr" >= 0.1 && $"pr" <= 0.9, 1L).otherwise(0L)).as("n_kept"),
        round(min(when($"pr" >= 0.1 && $"pr" <= 0.9, $"ratio")), 6).as("band_lo"),
        round(max(when($"pr" >= 0.1 && $"pr" <= 0.9, $"ratio")), 6).as("band_hi"),
        sum(when($"pr" >= 0.1 && $"pr" <= 0.9, $"doc_id")).as("kept_checksum"))
      .orderBy($"lang")
  }

  val q160Sql: String =
    raw"""WITH scored AS (
      |  SELECT doc_id, lang,
      |    round(CAST(len(list_filter(toks, x -> x IN $stopSqlList)) AS DOUBLE)
      |          / len(toks), 6) AS ratio
      |  FROM (SELECT doc_id, lang, regexp_extract_all(lower(text), '\S+') AS toks
      |        FROM documents) t),
      |pr AS (
      |  SELECT lang, doc_id, ratio,
      |    percent_rank() OVER (PARTITION BY lang ORDER BY ratio, doc_id) AS pr
      |  FROM scored)
      |SELECT lang, count(*) AS n_docs,
      |  CAST(sum(CASE WHEN pr >= 0.1 AND pr <= 0.9 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |  round(min(CASE WHEN pr >= 0.1 AND pr <= 0.9 THEN ratio END), 6) AS band_lo,
      |  round(max(CASE WHEN pr >= 0.1 AND pr <= 0.9 THEN ratio END), 6) AS band_hi,
      |  CAST(sum(CASE WHEN pr >= 0.1 AND pr <= 0.9 THEN doc_id END) AS BIGINT) AS kept_checksum
      |FROM pr GROUP BY lang ORDER BY lang""".stripMargin

  /** q165: cross-source contamination MATRIX — q101 generalized from
    * "benchmark vs rest" to every source pair: distinct 3-token
    * shingles per source, pairwise intersection via one equality join
    * on the shingle, union by inclusion–exclusion |A|+|B|−|A∩B| (exact
    * integers — no distinct-over-union pass needed), Jaccard as the
    * one rounded division. The report a curation pipeline reads to
    * find which sources are actually the same crawl twice.
    *
    * Scale: the (source, shingle) distinct table is the only
    * corpus-sized structure (one shuffle); the pair join is
    * shingle-keyed equality — candidate-proportional, never |A|·|B| —
    * and per-source totals are a broadcast side table. */
  def q165SourceOverlap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val sh = Dedup.docShingles(s, dir) // shared exploded build (r13)
      .select($"source", $"sh")
      .distinct()
      .persist() // totals + both join sides
    val tot = sh.groupBy($"source").agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        $"a.sh" === $"b.sh" && $"a.source" < $"b.source")
      .groupBy($"a.source".as("src_a"), $"b.source".as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
    inter
      .join(broadcast(tot.select($"source".as("ta"), $"n".as("na"))), $"src_a" === $"ta")
      .join(broadcast(tot.select($"source".as("tb"), $"n".as("nb"))), $"src_b" === $"tb")
      .select($"src_a", $"src_b", $"n_shared", $"na", $"nb",
        round($"n_shared" / ($"na" + $"nb" - $"n_shared"), 6).as("jaccard"))
      .orderBy($"src_a", $"src_b")
  }

  val q165Sql: String =
    """WITH sh AS (
      |  SELECT DISTINCT source, unnest(list_distinct([
      |    concat_ws(' ', toks[i], toks[i+1], toks[i+2])
      |    FOR i IN generate_series(1, greatest(len(toks) - 2, 1))])) AS sh
      |  FROM (SELECT source, regexp_extract_all(lower(text), '\S+') AS toks
      |        FROM documents) t),
      |tot AS (SELECT source, count(*) AS n FROM sh GROUP BY source),
      |inter AS (
      |  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_shared
      |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
      |  GROUP BY 1, 2)
      |SELECT i.src_a, i.src_b, i.n_shared, ta.n AS na, tb.n AS nb,
      |  round(i.n_shared / (ta.n + tb.n - i.n_shared), 6) AS jaccard
      |FROM inter i
      |JOIN tot ta ON i.src_a = ta.source
      |JOIN tot tb ON i.src_b = tb.source
      |ORDER BY src_a, src_b""".stripMargin

  /** q177: bigram NOVELTY scoring — per document, what fraction of its
    * distinct bigrams appears in NO other document (corpus df = 1).
    * The cheap, exact complement of the quality family: boilerplate
    * and template spam score near 0 (every bigram shared), genuinely
    * novel text scores near 1 — a curation signal orthogonal to
    * stopword/length heuristics (q32) and near-dup distance (q34).
    *
    * Shape: explode distinct bigrams (the dedup family's shingle
    * builder at w=2) ONCE — materialized with a localCheckpoint, since
    * the higher-order shingle build is the interpreted path and paying
    * it twice doubled the query — then two aggregations and NO
    * bigram-keyed join back: a df=1 bigram has exactly one owner, so
    * `min(doc_id)` in the df aggregation IS the owner, and the novel
    * count per doc is a second tiny aggregation over the unique
    * bigrams only. (The first cut joined the full exploded frame back
    * against the df table: same answer, one more |tokens|-sized
    * shuffle — 7.2 s vs 3.4 s at sf0.1.) The ratio is one double
    * division of exact integers, rounded after (q167's
    * arithmetic-class discipline). */
  def q177BigramNovelty(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bg = Tables.documents(s, dir)
      .select($"doc_id", explode(Dedup.shingles(tokens($"text"), 2)).as("bg"))
      .localCheckpoint(true)
    val novel = bg.groupBy($"bg")
      .agg(count(lit(1)).as("df"), min($"doc_id").as("owner"))
      .filter($"df" === 1)
      .groupBy($"owner".as("doc_id"))
      .agg(count(lit(1)).as("novel"))
    bg.groupBy($"doc_id").agg(count(lit(1)).as("n_bigrams"))
      .join(novel, Seq("doc_id"), "left")
      .select($"doc_id", $"n_bigrams",
        coalesce($"novel", lit(0L)).as("n_novel"),
        round(coalesce($"novel", lit(0L)).cast("double") / $"n_bigrams", 4)
          .as("novelty"))
      .orderBy($"doc_id")
  }

  val q177Sql: String =
    """WITH d AS (
      |  SELECT doc_id, list_distinct([concat_ws(' ', toks[i], toks[i+1])
      |    FOR i IN generate_series(1, greatest(len(toks) - 1, 1))]) AS bgs
      |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
      |        FROM documents) t),
      |e AS (SELECT doc_id, unnest(bgs) AS bg FROM d),
      |f AS (SELECT bg, count(*) AS df, min(doc_id) AS owner
      |      FROM e GROUP BY bg),
      |nv AS (SELECT owner AS doc_id, count(*) AS novel
      |       FROM f WHERE df = 1 GROUP BY owner),
      |sz AS (SELECT doc_id, count(*) AS n_bigrams FROM e GROUP BY doc_id)
      |SELECT sz.doc_id, sz.n_bigrams,
      |  CAST(coalesce(nv.novel, 0) AS BIGINT) AS n_novel,
      |  round(CAST(coalesce(nv.novel, 0) AS DOUBLE) / sz.n_bigrams, 4) AS novelty
      |FROM sz LEFT JOIN nv ON nv.doc_id = sz.doc_id
      |ORDER BY sz.doc_id""".stripMargin

  /** q182: BPE merge steps — the first two iterations of byte-pair
    * encoding TRAINING (Sennrich et al., "Neural Machine Translation
    * of Rare Words with Subword Units"), unrolled and hash-graded: count
    * weighted adjacent symbol pairs over the word-frequency table, pick
    * the best merge (count DESC, pair ASC — the tie order in the query
    * text), APPLY it, and count again. The tokenizer-training side of
    * the pipeline the token-counting family (q67) consumes.
    *
    * The apply step stays relational because before any merge every
    * symbol is one character, so "merge (a,b) leftmost-greedy" IS
    * `replace(word, 'ab', chr(1))` — both engines' replace substitutes
    * non-overlapping occurrences left to right, and the placeholder is
    * translated back to the merged symbol when the next round's pairs
    * are reported. The word table is the BPE trick itself: pair counts
    * aggregate over DISTINCT words weighted by frequency (|vocab| rows,
    * not |tokens|), so each round is one explode + one hash aggregation
    * over the vocabulary, and the chosen merge is a broadcast 1-row
    * scalar graft (the q117 pattern), never a driver-side loop.
    *
    * Output: top-10 pairs of each round with ranks — rank 1 of round 1
    * is the first merge of the real algorithm, round 2's table is the
    * state after applying it. */
  def q182BpeMerges(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ph = "\u0001" // merge placeholder; must not pre-exist in the corpus
    val words = Tables.documents(s, dir)
      .select(explode(tokens($"text")).as("w"))
      .filter(!$"w".contains(ph))
      .groupBy($"w").agg(count(lit(1)).as("wc"))
    def chars(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      transform(sequence(lit(1), length(c)), i => c.substr(i, lit(1)))
    def pairs(df: DataFrame, sym: org.apache.spark.sql.Column): DataFrame = {
      val cs = chars(sym)
      df.select($"wc", explode(zip_with(
          slice(cs, lit(1), size(cs) - 1), slice(cs, lit(2), size(cs) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .groupBy($"p.l".as("l"), $"p.r".as("r"))
        .agg(sum($"wc").as("cnt"))
    }
    def ranked(p: DataFrame): DataFrame =
      p.withColumn("rk", row_number().over(
        Window.orderBy($"cnt".desc, $"l".asc, $"r".asc)))
    val r1 = ranked(pairs(words, $"w"))
    val best1 = r1.filter($"rk" === 1)
      .select(concat($"l", $"r").as("m"))
    val w2 = words.crossJoin(broadcast(best1))
      .select(org.apache.spark.sql.functions.replace($"w", $"m", lit(ph)).as("w"),
        $"wc", $"m")
    val r2raw = {
      val cs = chars($"w")
      w2.select($"wc", $"m", explode(zip_with(
          slice(cs, lit(1), size(cs) - 1), slice(cs, lit(2), size(cs) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .select($"wc",
          when($"p.l" === ph, $"m").otherwise($"p.l").as("l"),
          when($"p.r" === ph, $"m").otherwise($"p.r").as("r"))
        .groupBy($"l", $"r").agg(sum($"wc").as("cnt"))
    }
    val r2 = ranked(r2raw)
    r1.filter($"rk" <= 10)
      .select(lit(1).as("iter"), $"rk", $"l".as("left_sym"), $"r".as("right_sym"), $"cnt".as("pair_count"))
      .unionByName(r2.filter($"rk" <= 10)
        .select(lit(2).as("iter"), $"rk", $"l".as("left_sym"), $"r".as("right_sym"), $"cnt".as("pair_count")))
      .orderBy($"iter", $"rk")
  }

  val q182Sql: String =
    """WITH w AS (
      |  SELECT tok AS w, count(*) AS wc FROM (
      |    SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS tok
      |    FROM documents) t
      |  WHERE strpos(tok, chr(1)) = 0
      |  GROUP BY tok),
      |i1 AS (SELECT w, wc, unnest(generate_series(1, len(w) - 1)) AS i FROM w),
      |p1 AS (SELECT substring(w, i, 1) AS l, substring(w, i + 1, 1) AS r, wc FROM i1),
      |g1 AS (SELECT l, r, CAST(sum(wc) AS BIGINT) AS cnt FROM p1 GROUP BY l, r),
      |r1 AS (SELECT l, r, cnt,
      |         row_number() OVER (ORDER BY cnt DESC, l ASC, r ASC) AS rk FROM g1),
      |b1 AS (SELECT l || r AS m FROM r1 WHERE rk = 1),
      |w2 AS (SELECT replace(w, (SELECT m FROM b1), chr(1)) AS w, wc FROM w),
      |i2 AS (SELECT w, wc, unnest(generate_series(1, len(w) - 1)) AS i FROM w2),
      |p2 AS (SELECT
      |         CASE WHEN substring(w, i, 1) = chr(1)
      |              THEN (SELECT m FROM b1) ELSE substring(w, i, 1) END AS l,
      |         CASE WHEN substring(w, i + 1, 1) = chr(1)
      |              THEN (SELECT m FROM b1) ELSE substring(w, i + 1, 1) END AS r,
      |         wc
      |       FROM i2),
      |g2 AS (SELECT l, r, CAST(sum(wc) AS BIGINT) AS cnt FROM p2 GROUP BY l, r),
      |r2 AS (SELECT l, r, cnt,
      |         row_number() OVER (ORDER BY cnt DESC, l ASC, r ASC) AS rk FROM g2)
      |SELECT iter, rk, left_sym, right_sym, pair_count FROM (
      |  SELECT 1 AS iter, rk, l AS left_sym, r AS right_sym, cnt AS pair_count
      |  FROM r1 WHERE rk <= 10
      |  UNION ALL
      |  SELECT 2, rk, l, r, cnt FROM r2 WHERE rk <= 10) u
      |ORDER BY iter, rk""".stripMargin

  /** q251: k-ROUND BPE TRAINING (VERDICT r15 item 4) — q182 unrolled
    * two merges and stopped; a real tokenizer trains thousands. This
    * is the k-round loop (k=8 registered) with the merge table as
    * DRIVER-RESIDENT MODEL STATE (the q237/q244 discipline: one
    * ≤k-entry table on the driver, one 1-row argmax collect per round,
    * persist rotation on the word table — never a 2^k lazily-chained
    * plan). Representation: after round j the merged symbol is the
    * single placeholder char chr(j), so EVERY symbol is always one
    * character and round t's apply step stays
    * `replace(w, raw(l)·raw(r), chr(t))` — q193's placeholder-space
    * trick made inductive. Pair counting translates placeholders back
    * to their real symbol strings (injective, so grouping is
    * unchanged) because the tie order (count DESC, left ASC, right
    * ASC) is defined on REAL symbols in the query text — the order
    * both engines replay.
    *
    * Output: the trained merge table — per round the chosen pair (as
    * real symbols), the merged symbol, its weighted pair count, and
    * the corpus symbol total AFTER applying the merge (the encode
    * pass's compression accounting: Σ wc·len(w) falls by exactly the
    * number of non-overlapping occurrences replaced, ≥1 and ≤
    * pair_count — pinned in LlmSpec). Oracle: all k rounds unrolled
    * CTE-by-CTE (q182's generator pattern) with the per-round word
    * tables MATERIALIZED — the multi-referenced k-step CTE chain is
    * the SQL twin of the 2^T lazy-plan bomb (q244's DuckDB lesson).
    *
    * 100 TB shape: each round is one explode + one hash aggregation
    * over the DISTINCT word table (|vocab| rows, not |tokens| — the
    * BPE trick), a 1-row collect, and one map-side replace; the corpus
    * is touched once (the initial word count). */
  def q251BpeTrain(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    cachedMerges(s, dir).zipWithIndex.map { case ((l, r, cnt, m, syms), j) =>
      (j + 1, l, r, m, cnt, syms)
    }.toDF("round", "left_sym", "right_sym", "merged", "pair_count", "corpus_syms")
      .orderBy($"round")
  }

  /** Cross-query memo of the k=8 merge table per (session, dir): q251
    * grades the table, q256 applies it — a tokenizer trains ONCE and
    * every consumer reads the artifact (the pairCache discipline for
    * driver-resident model state; the value is a 5-tuple Vector, so
    * onDiscard is a no-op and the ledger still records the training
    * seconds under "bpe_merges"). */
  private val mergeCache =
    new graft.SessionCache[Vector[(String, String, Long, String, Long)]](
      label = "bpe_merges")

  private def cachedMerges(s: SparkSession,
      dir: String): Vector[(String, String, Long, String, Long)] =
    mergeCache.getOrElseUpdate(s, dir,
      bpeTrainMerges(Tables.documents(s, dir), k = 8))

  /** q251's engine on an arbitrary (doc_id, text) frame — split out so
    * LlmSpec can pin merge chaining (a merged symbol participating in
    * a later merge) on a constructed corpus at small k. Throws if the
    * corpus exhausts (no pair left) before k rounds. */
  def bpeTrainFrom(docs: DataFrame, k: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    val merges = bpeTrainMerges(docs, k)
    merges.zipWithIndex.map { case ((l, r, cnt, m, syms), j) =>
      (j + 1, l, r, m, cnt, syms)
    }.toDF("round", "left_sym", "right_sym", "merged", "pair_count", "corpus_syms")
      .orderBy($"round")
  }

  private def ph(j: Int): String = j.toChar.toString // chr(1)..chr(8)

  /** The placeholder-space chars of a real symbol under a merge table
    * prefix — identity for original chars, chr(j) for merge j's
    * output. */
  private def rawSym(merges: Seq[(String, String, Long, String, Long)],
                     sym: String): String =
    merges.indexWhere(_._4 == sym) match {
      case -1 => sym
      case j  => ph(j + 1)
    }

  /** The k-round training loop itself, returning the DRIVER-RESIDENT
    * merge table (left, right, count, merged, corpus_syms) — shared by
    * q251 (the graded merge table) and q256 (the corpus-wide encode
    * pass applying it). */
  private[graft] def bpeTrainMerges(docs: DataFrame,
      k: Int): Vector[(String, String, Long, String, Long)] = {
    val s = docs.sparkSession
    import s.implicits._
    require(k >= 1 && k <= 8, s"k=$k outside the placeholder range 1..8")
    val noPh = (1 to 8).map(j => !$"text".contains(ph(j))).reduce(_ && _)
    def chars(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      transform(sequence(lit(1), length(c)), i => c.substr(i, lit(1)))
    var words = docs.filter(noPh)
      .select(explode(tokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("wc"))
      .persist()
    // driver-resident merge table: (left, right, count, merged, syms)
    var merges = Vector.empty[(String, String, Long, String, Long)]
    // failure paths must not strand cached word tables (CODE-REVIEW
    // r16): the loop rotates persists on success; the outer finally
    // frees whatever `words` points at when a round throws (the
    // exhausted-corpus IllegalStateException, or any Spark failure),
    // and the syms step frees its own `next` on the narrow window
    // between persist and rotation. unpersist is idempotent, so the
    // success path's own frees are unaffected.
    try {
    for (t <- 1 to k) {
      // translate a placeholder-space symbol column to real symbols
      val tr = (c: org.apache.spark.sql.Column) => merges.zipWithIndex.foldLeft(c) {
        case (acc, ((_, _, _, m, _), j)) => when(c === ph(j + 1), m).otherwise(acc)
      }
      val cs = chars($"w")
      val pc = words
        .select($"wc", explode(zip_with(
          slice(cs, lit(1), size(cs) - 1), slice(cs, lit(2), size(cs) - 1),
          (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
        .select($"wc", tr($"p.l").as("l"), tr($"p.r").as("r"))
        .groupBy($"l", $"r").agg(sum($"wc").as("cnt"))
      val bestRows = pc.orderBy($"cnt".desc, $"l".asc, $"r".asc).limit(1).collect()
      if (bestRows.isEmpty)
        throw new IllegalStateException(
          s"BPE training exhausted the corpus at round $t of $k — no adjacent pair left")
      val best = bestRows(0)
      val (l, r, cnt) = (best.getString(0), best.getString(1), best.getLong(2))
      // ADVICE r16: if two rounds ever minted the SAME merged string
      // (two different (l, r) pairs concatenating identically), later
      // rawSym translations would resolve occurrences to the FIRST
      // round's placeholder only and replace() would miss text encoded
      // under the second — fail loudly at training, not via a
      // downstream invariant at bench time. Uniqueness also keeps
      // real↔placeholder translation injective, which is what makes
      // the census tie order total.
      require(!merges.exists(_._4 == l + r),
        s"BPE degenerate merge at round $t: '${l + r}' was already minted by an earlier round")
      val next = words
        .select(org.apache.spark.sql.functions.replace(
          $"w", lit(rawSym(merges, l) + rawSym(merges, r)), lit(ph(t))).as("w"), $"wc")
        .persist()
      val syms =
        try next.agg(sum($"wc" * length($"w"))).collect()(0).getLong(0)
        catch { case e: Throwable => next.unpersist(); throw e }
      words.unpersist() // next is materialized by the syms collect
      words = next
      merges :+= ((l, r, cnt, l + r, syms))
    }
    } finally words.unpersist()
    merges
  }

  /** q251 oracle: k=8 rounds unrolled — per round the pair census over
    * the previous word table (placeholders translated through the
    * earlier rounds' scalar merge CTEs), the LIMIT 1 argmax at the
    * query-text tie order, the placeholder-space replace, and the
    * symbol total; word tables and per-round argmaxes MATERIALIZED. */
  /** Placeholder→real translation of a symbol expression at round t
    * (SQL side of `tr` in [[bpeTrainMerges]]). */
  private def bpeTrSql(x: String, t: Int): String =
    if (t == 1) x
    else {
      val whens = (1 until t)
        .map(j => s"WHEN chr($j) THEN (SELECT m FROM b$j)").mkString(" ")
      s"CASE $x $whens ELSE $x END"
    }

  /** Real→placeholder translation of a symbol expression at round t
    * (SQL side of [[rawSym]]). */
  private def bpeRawSql(y: String, t: Int): String =
    if (t == 1) y
    else {
      val whens = (1 until t)
        .map(j => s"WHEN $y = (SELECT m FROM b$j) THEN chr($j)").mkString(" ")
      s"CASE $whens ELSE $y END"
    }

  private val bpeNoPhSql: String =
    (1 to 8).map(j => s"strpos(text, chr($j)) = 0").mkString(" AND ")

  /** The k-round training WITH-prefix shared by q251Sql and q256Sql:
    * global word table w0 + per round the pair census, LIMIT 1 argmax,
    * placeholder replace and symbol total — word tables and argmaxes
    * MATERIALIZED (the DuckDB CTE-inlining lesson, q244). Ends with a
    * trailing comma. */
  private def bpeRoundCtes(K: Int): String = {
    val rounds = (1 to K).map { t =>
      s"""i$t AS (SELECT w, wc, unnest(generate_series(1, len(w) - 1)) AS i FROM w${t - 1}),
         |g$t AS MATERIALIZED (
         |  SELECT ${bpeTrSql("substring(w, i, 1)", t)} AS l,
         |         ${bpeTrSql("substring(w, i + 1, 1)", t)} AS r,
         |         CAST(sum(wc) AS BIGINT) AS cnt
         |  FROM i$t GROUP BY 1, 2),
         |b$t AS MATERIALIZED (
         |  SELECT l, r, l || r AS m, cnt FROM g$t
         |  ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
         |w$t AS MATERIALIZED (
         |  SELECT replace(w,
         |    ${bpeRawSql(s"(SELECT l FROM b$t)", t)} || ${bpeRawSql(s"(SELECT r FROM b$t)", t)},
         |    chr($t)) AS w, wc
         |  FROM w${t - 1}),
         |s$t AS (SELECT CAST(sum(wc * len(w)) AS BIGINT) AS syms FROM w$t),""".stripMargin
    }.mkString("\n")
    s"""w0 AS MATERIALIZED (
       |  SELECT tok AS w, count(*) AS wc FROM (
       |    SELECT unnest(regexp_extract_all(lower(text), '\\S+')) AS tok
       |    FROM documents WHERE $bpeNoPhSql) t
       |  GROUP BY tok),
       |$rounds""".stripMargin
  }

  val q251Sql: String = {
    val K = 8
    val out = (1 to K).map { t =>
      s"""  SELECT $t AS round, (SELECT l FROM b$t) AS left_sym,
         |    (SELECT r FROM b$t) AS right_sym, (SELECT m FROM b$t) AS merged,
         |    (SELECT cnt FROM b$t) AS pair_count,
         |    (SELECT syms FROM s$t) AS corpus_syms""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH ${bpeRoundCtes(K)}
       |fin AS (
       |$out
       |)
       |SELECT round, left_sym, right_sym, merged, pair_count, corpus_syms
       |FROM fin ORDER BY round""".stripMargin
  }

  /** q256: the ENCODE pass at the k=8 merge table — close the r16
    * tokenizer loop the way q193 closed q182's: train the 8 merges
    * in-engine ([[bpeTrainMerges]] — the SAME driver-resident loop
    * q251 grades), then apply ALL EIGHT to every word of every source
    * as one flat chain of literal replaces (the merge table is driver
    * state, so the whole encode is a single codegen'd projection — no
    * per-round action, no join), and report per-source compression
    * with exact integer accounting: token count, chars before, symbols
    * after, saved parts-per-million. The oracle re-derives the merge
    * table CTE-by-CTE (shared [[bpeRoundCtes]] generator — one
    * training definition, two graded consumers) and applies the same
    * nested replace per source. Σ_source syms_after must equal q251's
    * round-8 corpus_syms — pinned in LlmSpec (the two queries grade
    * one training run's global and per-source views). */
  def q256BpeEncode8(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val merges = cachedMerges(s, dir)
    val noPh = (1 to 8).map(j => !$"text".contains(ph(j))).reduce(_ && _)
    val srcWords = docs.filter(noPh)
      .select($"source", explode(tokens($"text")).as("w"))
      .groupBy($"source", $"w").agg(count(lit(1)).as("wc"))
    val applied = merges.zipWithIndex.foldLeft($"w": org.apache.spark.sql.Column) {
      case (acc, ((l, r, _, _, _), j)) =>
        org.apache.spark.sql.functions.replace(acc,
          lit(rawSym(merges.take(j), l) + rawSym(merges.take(j), r)),
          lit(ph(j + 1)))
    }
    srcWords
      .select($"source", $"wc", length($"w").as("nc"), length(applied).as("ns"))
      .groupBy($"source")
      .agg(sum($"wc").as("n_tokens"),
        sum($"wc" * $"nc").as("chars_before"),
        sum($"wc" * $"ns").as("syms_after"))
      .select($"source", $"n_tokens", $"chars_before", $"syms_after",
        expr("CAST(((chars_before - syms_after) * 1000000) div chars_before AS BIGINT)")
          .as("saved_ppm"))
      .orderBy($"source")
  }

  val q256Sql: String = {
    val K = 8
    val nested = (1 to K).foldLeft("w") { (acc, t) =>
      s"replace($acc, ${bpeRawSql(s"(SELECT l FROM b$t)", t)} || " +
        s"${bpeRawSql(s"(SELECT r FROM b$t)", t)}, chr($t))"
    }
    s"""WITH ${bpeRoundCtes(K)}
       |srcw AS (
       |  SELECT source, tok AS w, count(*) AS wc FROM (
       |    SELECT source, unnest(regexp_extract_all(lower(text), '\\S+')) AS tok
       |    FROM documents WHERE $bpeNoPhSql) t
       |  GROUP BY source, tok),
       |enc AS (
       |  SELECT source, wc, len(w) AS nc, len($nested) AS ns
       |  FROM srcw)
       |SELECT source,
       |  CAST(sum(wc) AS BIGINT) AS n_tokens,
       |  CAST(sum(wc * nc) AS BIGINT) AS chars_before,
       |  CAST(sum(wc * ns) AS BIGINT) AS syms_after,
       |  CAST((sum(wc * nc) - sum(wc * ns)) * 1000000 // sum(wc * nc) AS BIGINT)
       |    AS saved_ppm
       |FROM enc GROUP BY source ORDER BY source""".stripMargin
  }

  /** First minted symbol id of the INTEGER-symbol BPE form — one past
    * the Unicode code-point space, so a minted id can never collide
    * with an original character. */
  val BpeSymBase: Int = 0x110000

  /** q259: k=16 BPE TRAINING, integer-symbol form (VERDICT r16 item
    * 2) — q251's loop with the k ≤ 8 REPRESENTATION cap lifted: the
    * placeholder trick spends one char per merge, so the char form
    * cannot reach even a toy vocabulary's hundreds of merges; here a
    * word is an `array<int>` symbol sequence (initial symbols = code
    * points) and merge t MINTS the fresh integer id BpeSymBase+t —
    * rounds are bounded by the vocabulary target, not the alphabet.
    *
    * Same plan shape as q251 (the anchor, kept registered): per round
    * one explode + hash aggregation over the DISTINCT word table, a
    * 1-row argmax collect, one map-side apply; merge table as
    * driver-resident model state with persist rotation and
    * exception-safe unpersist. The apply step is a left-to-right fold
    * (`aggregate`): a pair (l, r) at the array tail of the
    * accumulator collapses to the minted id — non-overlapping
    * left-to-right, EXACTLY `replace`'s semantics (the minted id is
    * fresh, so a replacement can never seed a new match in the same
    * round), which is what makes the int form ≡ the char form on
    * rounds 1..8 (pinned in LlmSpec on constructed AND live corpora).
    * The census argmax tie order is (cnt DESC, real-string ASC,
    * real-string ASC) — the minted-string uniqueness assert keeps the
    * int→string translation injective, so the order stays TOTAL and
    * both engines replay it; the in-engine translation uses `char()`
    * for original code points (exact on this ASCII corpus — the same
    * alphabet assumption the char form's placeholder filter makes).
    *
    * Oracle: all 16 rounds unrolled CTE-by-CTE (MATERIALIZED word
    * tables, q244's DuckDB lesson) with the apply fold restated as
    * `list_reduce` over 1-int lists — bit-identical fold semantics,
    * verified against the same pair/argmax/total arithmetic. */
  def q259BpeTrain16(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    cachedInt16(s, dir)._1
      .zipWithIndex.map { case ((_, _, cnt, ls, rs, m, syms), j) =>
        (j + 1, ls, rs, m, cnt, syms)
      }.toDF("round", "left_sym", "right_sym", "merged", "pair_count", "corpus_syms")
      .orderBy($"round")
  }

  /** Cross-query memo of the k=16 int-form training artifacts per
    * (session, dir) — the mergeCache discipline, now holding BOTH
    * outputs of one training run: the 16-row merge table (q259 grades
    * it) and the PINNED encoded vocabulary (q261 joins it). A
    * race-losing build frees its vocabulary blocks via onDiscard. */
  private val mergeCache16 =
    new graft.SessionCache[(Vector[(Int, Int, Long, String, String, String, Long)],
      DataFrame)](onDiscard = v => graft.Ckpt.free(v._2), label = "bpe_merges16")

  private def cachedInt16(s: SparkSession, dir: String)
      : (Vector[(Int, Int, Long, String, String, String, Long)], DataFrame) =
    mergeCache16.getOrElseUpdate(s, dir, {
      val (m, vocab) = bpeTrainIntWithVocab(Tables.documents(s, dir), k = 16)
      val pinnedVocab = graft.Ckpt.pinned(vocab) // survives per-query sweeps
      graft.Ckpt.free(vocab)
      (m, pinnedVocab)
    })

  /** The cached k=16 encoded vocabulary (w, syms, wc) — the
    * cross-query training artifact, exposed for the q276 funnel census
    * (its tokenize accounting joins the same vocabulary q261/q266
    * consume). */
  private[llm] def vocab16(s: SparkSession, dir: String): DataFrame =
    cachedInt16(s, dir)._2

  /** q261: the k=16 ENCODE pass as a VOCABULARY JOIN — q256 closed the
    * char-form loop by re-applying the 8 merges to every source word;
    * at k=16 the training artifact already contains something better:
    * the final word table IS the encoded vocabulary (every distinct
    * corpus word with its fully-merged symbol sequence — the loop
    * rewrites it every round anyway), so the encode pass is one
    * dictionary join, no re-apply, no 16-deep expression. That is how
    * a production tokenizer encodes known words at 100 TB: the
    * per-source pass shuffles (source, w, wc) once and joins the
    * |vocab|-row dictionary — work ∝ corpus tokenize + vocab, with no
    * per-merge term at all. Exact integer accounting per source
    * (q256's columns: tokens, chars before, symbols after, saved ppm).
    * Oracle: the shared 16-round generator's final word table joined
    * the same way. LlmSpec pins Σ syms_after == q259's round-16
    * corpus_syms AND k=16 ≤ k=8 per source (more merges never hurt —
    * each merge only shrinks symbol sequences). */
  def q261BpeEncode16(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val enc = cachedInt16(s, dir)._2.select($"w", size($"syms").as("ns"))
    Tables.documents(s, dir)
      .select($"source", explode(tokens($"text")).as("w"))
      .groupBy($"source", $"w").agg(count(lit(1)).as("wc"))
      .join(enc, Seq("w"))
      .select($"source", $"wc", length($"w").as("nc"), $"ns")
      .groupBy($"source")
      .agg(sum($"wc").as("n_tokens"),
        sum($"wc" * $"nc").as("chars_before"),
        sum($"wc" * $"ns").as("syms_after"))
      .select($"source", $"n_tokens", $"chars_before", $"syms_after",
        expr("CAST(((chars_before - syms_after) * 1000000) div chars_before AS BIGINT)")
          .as("saved_ppm"))
      .orderBy($"source")
  }

  val q261Sql: String = {
    s"""WITH ${bpeIntRoundCtes(16)}
       |srcw AS (
       |  SELECT source, tok AS w, count(*) AS wc FROM (
       |    SELECT source, unnest(regexp_extract_all(lower(text), '\\S+')) AS tok
       |    FROM documents) t
       |  GROUP BY source, tok),
       |enc AS (
       |  SELECT s.source, s.wc, len(s.w) AS nc, len(v.syms) AS ns
       |  FROM srcw s JOIN w16 v USING (w))
       |SELECT source,
       |  CAST(sum(wc) AS BIGINT) AS n_tokens,
       |  CAST(sum(wc * nc) AS BIGINT) AS chars_before,
       |  CAST(sum(wc * ns) AS BIGINT) AS syms_after,
       |  CAST((sum(wc * nc) - sum(wc * ns)) * 1000000 // sum(wc * nc) AS BIGINT)
       |    AS saved_ppm
       |FROM enc GROUP BY source ORDER BY source""".stripMargin
  }

  /** q262: OOV ENCODE for the int-form tokenizer (VERDICT r17 item 1)
    * — the first thing a user of q259/q261 hits: the first novel
    * document contains words ABSENT from the training vocabulary, and
    * q261's inner vocabulary join would silently drop them from the
    * accounting. The corpus's vocabulary is CLOSED (every word appears
    * in every slice), so the held-out source is DERIVED: the
    * doc_id % 5 = 0 slice's token stream MIRRORED — each token
    * contributes itself and its reversal (30 of the 31 corpus words
    * reverse to novel strings), giving the encode pass a guaranteed
    * mix of known and OOV mass. The production two-path plan: known
    * words resolve through the |vocab|-row dictionary join (zero
    * per-merge cost, q261's shape — the SAME cached k=16 training
    * run), and OOV words — the LEFT join's null side, never dropped —
    * fall back to re-applying the 16 merges
    * ([[BpeApply.applyMergesInt]], the q256 re-apply pattern lifted to
    * int symbols; pinned ≡ the training fold in LlmSpec). Per-source
    * exact integer accounting plus the OOV census (distinct OOV words,
    * OOV token mass) that the silent drop would have zeroed. 100 TB
    * shape: the vocab join broadcasts model state, the fallback is a
    * narrow per-row pass over ONLY the OOV slice (per-word work ∝
    * 16·|word|, no shuffle, no driver action).
    *
    * Oracle: the shared full-corpus 16-round generator, then FULL
    * re-apply of all 16 merges to every mirrored word (no vocab join
    * at all) — so the hash grade itself proves vocab-join + fallback ≡
    * full re-apply on every word of the held-out stream. */
  def q262BpeEncodeOov(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (merges, vocab) = cachedInt16(s, dir)
    val mpairs = merges.map(m => (m._1, m._2))
    val enc = vocab.select($"w", size($"syms").as("ns"))
    val srcw = Tables.documents(s, dir).filter($"doc_id" % 5 === 0)
      .select($"source", explode(tokens($"text")).as("w0"))
      .select($"source", explode(array($"w0", reverse($"w0"))).as("w"))
      .groupBy($"source", $"w").agg(count(lit(1)).as("wc"))
    val joined = srcw.join(enc, Seq("w"), "left")
    val known = joined.filter($"ns".isNotNull)
      .select($"source", $"w", $"wc", $"ns", lit(false).as("oov"))
    val oov = joined.filter($"ns".isNull)
      .select($"source", $"w", $"wc").as[(String, String, Long)]
      .mapPartitions { it =>
        it.map { case (src, w, wc) =>
          (src, w, wc, BpeApply.applyMergesInt(w, mpairs).length, true)
        }
      }
      .toDF("source", "w", "wc", "ns", "oov")
    known.unionByName(oov)
      .groupBy($"source")
      .agg(sum($"wc").as("n_tokens"),
        sum($"wc" * length($"w")).as("chars_before"),
        sum($"wc" * $"ns").as("syms_after"),
        countDistinct(when($"oov", $"w")).as("n_oov_types"),
        sum(when($"oov", $"wc").otherwise(0L)).as("n_oov_tokens"))
      .select($"source", $"n_tokens", $"chars_before", $"syms_after",
        $"n_oov_types", $"n_oov_tokens",
        expr("CAST(((chars_before - syms_after) * 1000000) div chars_before AS BIGINT)")
          .as("saved_ppm"))
      .orderBy($"source")
  }

  val q262Sql: String = {
    val K = 16
    // ho0..ho16: the FULL re-apply chain over every mirrored word —
    // the same per-round list_reduce fold the training CTEs use,
    // driven by the shared full-corpus b1..b16 merge rows
    val hoRounds = (1 to K).map { t =>
      s"""ho$t AS MATERIALIZED (
         |  SELECT wt.w, list_reduce(
         |    list_transform(wt.syms, x -> [x]),
         |    (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b$t.l AND x[1] = b$t.r
         |                THEN list_append(acc[:len(acc) - 1], b$t.mid)
         |                ELSE list_append(acc, x[1]) END) AS syms
         |  FROM ho${t - 1} wt, b$t),""".stripMargin
    }.mkString("\n")
    raw"""WITH ${bpeIntRoundCtes(K)}
       |srcw AS MATERIALIZED (
       |  SELECT source, w, count(*) AS wc FROM (
       |    SELECT source, unnest([tok, reverse(tok)]) AS w FROM (
       |      SELECT source, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
       |      FROM documents WHERE doc_id % 5 = 0) t) t2
       |  GROUP BY source, w),
       |ho0 AS MATERIALIZED (
       |  SELECT w,
       |    [unicode(w[i]) FOR i IN generate_series(1, len(w))] AS syms
       |  FROM (SELECT DISTINCT w FROM srcw) t),
       |$hoRounds
       |enc AS (
       |  SELECT s.source, s.w, s.wc, len(s.w) AS nc, len(h.syms) AS ns,
       |         (v.w IS NULL) AS oov
       |  FROM srcw s JOIN ho$K h USING (w)
       |  LEFT JOIN w$K v ON v.w = s.w)
       |SELECT source,
       |  CAST(sum(wc) AS BIGINT) AS n_tokens,
       |  CAST(sum(wc * nc) AS BIGINT) AS chars_before,
       |  CAST(sum(wc * ns) AS BIGINT) AS syms_after,
       |  count(DISTINCT CASE WHEN oov THEN w END) AS n_oov_types,
       |  CAST(sum(CASE WHEN oov THEN wc ELSE 0 END) AS BIGINT) AS n_oov_tokens,
       |  CAST((sum(wc * nc) - sum(wc * ns)) * 1000000 // sum(wc * nc) AS BIGINT)
       |    AS saved_ppm
       |FROM enc GROUP BY source ORDER BY source""".stripMargin
  }

  /** q266: the tokenizer's PRODUCT — the ordered token-ID stream per
    * document. q261/q262 grade the encode ACCOUNTING (symbol counts);
    * a training pipeline's actual output is the id sequence itself, in
    * token order, written next to the document. Per doc: the token
    * stream through the k=16 vocabulary (the same cached training run;
    * whitespace tokenization — separators carry no ids by policy),
    * each word's fully-merged symbol sequence flattened in POSITION
    * order. Graded exactly without shipping whole sequences through
    * the hash gate twice: n_words, n_ids, and two exact integer
    * checksums over the full sequence — Σ ids (mass) and Σ pos·ids
    * (ORDER: any transposition of two distinct ids changes it), both
    * well inside long range (ids < 2^21, pos < 2^10). 100 TB shape:
    * posexplode + one broadcast dictionary join + per-doc sort_array
    * of (pos, syms) structs — work ∝ corpus tokens, the one shuffle
    * keyed by doc_id, no driver action, no per-merge term. */
  def q266BpeIdStream(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val enc = cachedInt16(s, dir)._2.select($"w", $"syms")
    val flat = flatten(transform(
      sort_array(collect_list(struct($"pos", $"syms"))), x => x("syms")))
    Tables.documents(s, dir)
      .select($"doc_id", posexplode(tokens($"text")))
      .withColumnRenamed("col", "w")
      .join(enc, Seq("w"))
      .groupBy($"doc_id")
      .agg(count(lit(1)).as("n_words"), flat.as("ids"))
      .select($"doc_id", $"n_words",
        size($"ids").cast("long").as("n_ids"),
        aggregate($"ids", lit(0L), (a, x) => a + x).as("ids_sum"),
        aggregate(zip_with($"ids",
            sequence(lit(1), greatest(size($"ids"), lit(1))),
            (x, i) => x.cast("long") * i),
          lit(0L), (a, x) => a + x).as("ids_wsum"))
      .orderBy($"doc_id")
  }

  val q266Sql: String = {
    raw"""WITH ${bpeIntRoundCtes(16)}
       |tk AS (
       |  SELECT doc_id,
       |    unnest([{'pos': i, 'w': toks[i]}
       |            FOR i IN generate_series(1, len(toks))], recursive := true)
       |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
       |        FROM documents) t),
       |enc AS (
       |  SELECT tk.doc_id, tk.pos, v.syms
       |  FROM tk JOIN w16 v ON v.w = tk.w),
       |ids AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |    flatten(list(syms ORDER BY pos)) AS ids
       |  FROM enc GROUP BY doc_id)
       |SELECT doc_id, n_words,
       |  CAST(len(ids) AS BIGINT) AS n_ids,
       |  CAST(list_sum(ids) AS BIGINT) AS ids_sum,
       |  CAST(list_sum([ids[i] * i FOR i IN generate_series(1, len(ids))])
       |       AS BIGINT) AS ids_wsum
       |FROM ids ORDER BY doc_id""".stripMargin
  }

  /** q274: DECODE — the inverse direction that completes the tokenizer
    * as a product: q259/q264 train, q261/q262 account, q266 emits the
    * id streams; a consumer of those streams needs ids → TEXT back
    * (inspection, spot-checks, serving). Per document the q266 stream
    * is re-derived and decoded: minted ids resolve through the 16-row
    * merge dictionary (driver-known model state — a CASE branch table,
    * the training loop's own trSql idiom), codepoint ids through
    * char(), concatenated in stream order. The roundtrip law is graded
    * explicitly: whitespace carries no ids BY POLICY (q266's stated
    * contract), so decode(encode(x)) equals lower(x) with whitespace
    * stripped — the `roundtrip` column says so per document, and the
    * decoded STRING itself ships through the hash gate (inversion
    * proven char-for-char, not just by length). 100 TB shape: decode
    * is a per-row projection over the id stream (no shuffle beyond
    * q266's own doc_id-keyed one, no per-merge term — the CASE table
    * is broadcast-free constant model state inside codegen).
    *
    * Oracle: the shared 16-round generator's accumulated mint
    * dictionary (mint16 ∪ b16) joined per id — a TABLE join on the
    * DuckDB side vs the engine's inlined branch table, so the hash
    * grade proves dictionary-join ≡ branch-table decode on every id
    * of every stream. */
  def q274BpeDecode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (merges, vocab) = cachedInt16(s, dir)
    val enc = vocab.select($"w", $"syms")
    def sqlStr(v: String): String = "'" + v.replace("'", "''") + "'"
    val whens = merges.zipWithIndex.map { case (m, j) =>
      s"WHEN ${BpeSymBase + j + 1} THEN ${sqlStr(m._6)}"
    }.mkString(" ")
    val flat = flatten(transform(
      sort_array(collect_list(struct($"pos", $"syms"))), x => x("syms")))
    val ids = Tables.documents(s, dir)
      .select($"doc_id", posexplode(tokens($"text")))
      .withColumnRenamed("col", "w")
      .join(enc, Seq("w"))
      .groupBy($"doc_id").agg(flat.as("ids"))
    Tables.documents(s, dir)
      .select($"doc_id",
        regexp_replace(lower($"text"), "\\s+", "").as("src"))
      .join(ids, Seq("doc_id"))
      .select($"doc_id", size($"ids").cast("long").as("n_ids"),
        expr(s"concat_ws('', transform(ids, x -> CASE x $whens ELSE char(x) END))")
          .as("decoded"), $"src")
      .select($"doc_id", $"n_ids", $"decoded",
        ($"decoded" === $"src").as("roundtrip"))
      .orderBy($"doc_id")
  }

  val q274Sql: String = {
    raw"""WITH ${bpeIntRoundCtes(16)}
       |mintall AS (SELECT mid, m FROM mint16 UNION ALL SELECT mid, m FROM b16),
       |tk AS (
       |  SELECT doc_id,
       |    unnest([{'pos': i, 'w': toks[i]}
       |            FOR i IN generate_series(1, len(toks))], recursive := true)
       |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
       |        FROM documents) t),
       |enc AS (
       |  SELECT tk.doc_id, tk.pos, v.syms
       |  FROM tk JOIN w16 v ON v.w = tk.w),
       |ids AS (
       |  SELECT doc_id, flatten(list(syms ORDER BY pos)) AS ids
       |  FROM enc GROUP BY doc_id),
       |tok AS (
       |  SELECT doc_id, i, ids[i] AS id
       |  FROM ids, unnest(generate_series(1, len(ids))) AS u(i)),
       |dec AS (
       |  SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_ids,
       |    string_agg(coalesce(m.m, chr(t.id)), '' ORDER BY t.i) AS decoded
       |  FROM tok t LEFT JOIN mintall m ON m.mid = t.id
       |  GROUP BY t.doc_id)
       |SELECT d.doc_id, d.n_ids, d.decoded,
       |  d.decoded = regexp_replace(lower(doc.text), '\s+', '', 'g') AS roundtrip
       |FROM dec d JOIN documents doc ON doc.doc_id = d.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }

  /** q270 packing parameters. `PackEosId` is the document separator:
    * `BpeSymBase` itself is reserved by construction — every codepoint
    * symbol is < BpeSymBase and every minted merge id is
    * BpeSymBase + t with t >= 1, so the separator can never collide
    * with a real token id. */
  val PackSeqLen = 256
  val PackEosId: Int = BpeSymBase

  /** q270: PACKED TRAINING SEQUENCES from the id streams (VERDICT r18
    * item 3) — the composition that is the tokenizer pipeline's actual
    * deliverable: q266 emits per-document ordered id streams; the
    * trainer consumes FIXED-LENGTH sequences. Policy, stated
    * explicitly: no BOS; one `PackEosId` separator appended per
    * document (the doc-boundary token); documents concatenate in
    * doc_id order WITHIN A SHARD (doc_id % 8 — q116's scale
    * discipline: packing is a running sum, inherently sequential, so
    * it runs per shard, embarrassingly parallel across shards, never
    * a global total order); the concatenation chops into
    * `PackSeqLen`-token sequences; the trailing partial sequence is
    * KEPT (n_tokens < PackSeqLen) so conservation is exact.
    *
    * Graded with q266's checksum discipline per (shard, seq_id):
    * n_tokens, n_eos (doc boundaries in the sequence), Σ ids (mass)
    * and Σ (pos+1)·id (ORDER — any transposition changes it).
    * Conservation is pinned in LlmSpec: Σ n_tokens ≡ q266's Σ n_ids
    * plus one EOS per emitted document, and Σ n_eos ≡ the document
    * count — boundary tokens accounted separately, exactly.
    *
    * 100 TB shape: per-doc offsets are one per-SHARD window over the
    * doc-level frame (one row per doc, 16 bytes); the token-level work
    * is posexplode → map-side partial aggregation → ONE shuffle keyed
    * (shard, seq_id) carrying only per-sequence partials — Θ(corpus
    * tokens) scan, the emission floor, no per-merge term. */
  def q270SeqPackIds(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    packedDocStreams(s, dir)
      .select($"shard", $"off0", posexplode($"ids").as(Seq("p", "id")))
      .withColumn("goff", $"off0" + $"p")
      .withColumn("seq_id", expr(s"goff div $PackSeqLen"))
      .withColumn("ps", expr(s"goff % $PackSeqLen"))
      .groupBy($"shard", $"seq_id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(when($"id" === PackEosId, 1L).otherwise(0L)).as("n_eos"),
        sum($"id".cast("long")).as("ids_sum"),
        sum(($"ps" + lit(1L)) * $"id").as("ids_wsum"))
      .orderBy($"shard", $"seq_id")
  }

  /** The per-document packed stream frame shared by q270/q272:
    * (doc_id, shard, ids = token ids + trailing EOS, off0 = the doc's
    * global token offset within its shard — a per-shard window over
    * the DOC-level frame, never a global total order). */
  private def packedDocStreams(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val enc = cachedInt16(s, dir)._2.select($"w", $"syms")
    val flat = flatten(transform(
      sort_array(collect_list(struct($"pos", $"syms"))), x => x("syms")))
    val w = Window.partitionBy($"shard").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, dir)
      .select($"doc_id", posexplode(tokens($"text")))
      .withColumnRenamed("col", "w")
      .join(enc, Seq("w"))
      .groupBy($"doc_id")
      .agg(concat(flat, array(lit(PackEosId))).as("ids"))
      .select($"doc_id", pmod($"doc_id", lit(8)).as("shard"), $"ids")
      .withColumn("off0",
        coalesce(sum(size($"ids").cast("long")).over(w), lit(0L)))
  }

  /** q272: the SEQUENCE BOUNDARY MAP — what a trainer consumes NEXT TO
    * q270's packed sequences: block-diagonal attention and loss
    * masking need WHERE each document ends inside each sequence, not
    * just how many do (q270's n_eos). One row per document: the
    * (shard, seq_id, pos) of its EOS token plus its id-stream length —
    * derived arithmetically from the shared per-doc offset frame
    * (off0 + |ids| − 1), NO token-level explode at all, so the whole
    * map costs one doc-level pass over the q270 frame. Fully
    * hash-graded row-for-row (boundaries are sparse — one per doc —
    * so no checksum compression is needed). Conservation pinned in
    * LlmSpec: per-sequence boundary counts ≡ q270's n_eos, Σ n_ids ≡
    * q266's totals, every doc exactly once. */
  def q272SeqBoundaryMap(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    packedDocStreams(s, dir)
      .withColumn("goff", $"off0" + size($"ids") - 1)
      .select($"shard",
        expr(s"goff div $PackSeqLen").as("seq_id"),
        expr(s"goff % $PackSeqLen").as("pos"),
        $"doc_id",
        (size($"ids") - 1).cast("long").as("n_ids"))
      .orderBy($"shard", $"seq_id", $"pos")
  }

  val q272Sql: String = {
    raw"""WITH ${bpeIntRoundCtes(16)}
       |tk AS (
       |  SELECT doc_id,
       |    unnest([{'pos': i, 'w': toks[i]}
       |            FOR i IN generate_series(1, len(toks))], recursive := true)
       |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
       |        FROM documents) t),
       |enc AS (
       |  SELECT tk.doc_id, tk.pos, v.syms
       |  FROM tk JOIN w16 v ON v.w = tk.w),
       |ids AS (
       |  SELECT doc_id, doc_id % 8 AS shard,
       |    list_append(flatten(list(syms ORDER BY pos)), $PackEosId) AS ids
       |  FROM enc GROUP BY doc_id),
       |offs AS (
       |  SELECT doc_id, shard, ids,
       |    CAST(coalesce(sum(len(ids)) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off0
       |  FROM ids)
       |SELECT shard,
       |  CAST((off0 + len(ids) - 1) // $PackSeqLen AS BIGINT) AS seq_id,
       |  CAST((off0 + len(ids) - 1) % $PackSeqLen AS BIGINT) AS pos,
       |  doc_id, CAST(len(ids) - 1 AS BIGINT) AS n_ids
       |FROM offs ORDER BY shard, seq_id, pos""".stripMargin
  }

  val q270Sql: String = {
    raw"""WITH ${bpeIntRoundCtes(16)}
       |tk AS (
       |  SELECT doc_id,
       |    unnest([{'pos': i, 'w': toks[i]}
       |            FOR i IN generate_series(1, len(toks))], recursive := true)
       |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
       |        FROM documents) t),
       |enc AS (
       |  SELECT tk.doc_id, tk.pos, v.syms
       |  FROM tk JOIN w16 v ON v.w = tk.w),
       |ids AS (
       |  SELECT doc_id, doc_id % 8 AS shard,
       |    list_append(flatten(list(syms ORDER BY pos)), $PackEosId) AS ids
       |  FROM enc GROUP BY doc_id),
       |offs AS (
       |  SELECT shard, ids,
       |    CAST(coalesce(sum(len(ids)) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off0
       |  FROM ids),
       |tok AS (
       |  SELECT shard, off0 + i - 1 AS goff, ids[i] AS id
       |  FROM offs, unnest(generate_series(1, len(ids))) AS u(i))
       |SELECT shard, CAST(goff // $PackSeqLen AS BIGINT) AS seq_id,
       |  CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN id = $PackEosId THEN 1 ELSE 0 END) AS BIGINT) AS n_eos,
       |  CAST(sum(id) AS BIGINT) AS ids_sum,
       |  CAST(sum((goff % $PackSeqLen + 1) * id) AS BIGINT) AS ids_wsum
       |FROM tok GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  /** The epochs q279 plans — enough to grade that epochs decorrelate
    * while keeping the output 3× the sequence inventory, not a
    * training run's worth. */
  val ShuffleEpochs: Seq[Int] = Seq(0, 1, 2)

  /** q279: the EPOCH SHUFFLE PLAN for the packed training sequences —
    * the last hop between q270's sequences and a training run: every
    * epoch must visit every sequence exactly once in an order that is
    * (a) decorrelated from the previous epoch, (b) REPRODUCIBLE from
    * the plan alone (resumable training re-derives position k of
    * epoch e without any stored state), and (c) computed WITHOUT a
    * global total order. The standard hash-shuffle does all three:
    * within each (epoch, shard), sequences order by
    * md5(epoch:shard:seq_id) (seq_id tie-break — md5 collisions cannot
    * break determinism), positions dense from 0. Shuffling stays
    * per-shard BY POLICY — q270's sharding discipline carries over
    * (the running sum there, the sort here: both are the per-shard
    * price of avoiding a global order), and a trainer reading S shards
    * round-robin gets cross-shard mixing for free. Output one row per
    * (epoch, shard, pos): the seq_id to read and its n_tokens (the
    * trailing partial rides the plan, so a step-budget cutoff is exact
    * token arithmetic). Graded row-for-row. 100 TB shape: one narrow
    * pass over the SEQUENCE inventory (not tokens — Θ(corpus)/256
    * rows), one per-(epoch, shard) window sort on a 16-byte key. */
  def q279SeqShufflePlan(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val seqs = q270SeqPackIds(s, dir).select($"shard", $"seq_id", $"n_tokens")
    val epochs = ShuffleEpochs.toDF("epoch")
    val w = Window.partitionBy($"epoch", $"shard").orderBy($"h", $"seq_id")
    seqs.crossJoin(broadcast(epochs))
      .withColumn("h", md5(concat_ws(":",
        $"epoch".cast("string"), $"shard".cast("string"),
        $"seq_id".cast("string"))))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .select($"epoch", $"shard", $"pos", $"seq_id", $"n_tokens")
      .orderBy($"epoch", $"shard", $"pos")
  }

  /** q279 oracle: q270's sequence inventory CTEs, the epoch VALUES
    * table, and the same md5 ordering — the hash strings concatenate
    * identically (integer-to-string has one canonical form on both
    * engines), so the permutation is bit-reproducible. */
  val q279Sql: String = {
    val epVals = ShuffleEpochs.map(e => s"($e)").mkString(", ")
    raw"""WITH ${bpeIntRoundCtes(16)}
       |tk AS (
       |  SELECT doc_id,
       |    unnest([{'pos': i, 'w': toks[i]}
       |            FOR i IN generate_series(1, len(toks))], recursive := true)
       |  FROM (SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS toks
       |        FROM documents) t),
       |enc AS (
       |  SELECT tk.doc_id, tk.pos, v.syms
       |  FROM tk JOIN w16 v ON v.w = tk.w),
       |ids AS (
       |  SELECT doc_id, doc_id % 8 AS shard,
       |    list_append(flatten(list(syms ORDER BY pos)), $PackEosId) AS ids
       |  FROM enc GROUP BY doc_id),
       |offs AS (
       |  SELECT shard, ids,
       |    CAST(coalesce(sum(len(ids)) OVER (PARTITION BY shard ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS off0
       |  FROM ids),
       |tok AS (
       |  SELECT shard, off0 + i - 1 AS goff
       |  FROM offs, unnest(generate_series(1, len(ids))) AS u(i)),
       |seqs AS (
       |  SELECT shard, CAST(goff // $PackSeqLen AS BIGINT) AS seq_id,
       |    CAST(count(*) AS BIGINT) AS n_tokens
       |  FROM tok GROUP BY 1, 2),
       |ep AS (SELECT epoch FROM (VALUES $epVals) e(epoch))
       |SELECT ep.epoch, s.shard,
       |  CAST(row_number() OVER (PARTITION BY ep.epoch, s.shard
       |    ORDER BY md5(CAST(ep.epoch AS VARCHAR) || ':' ||
       |                 CAST(s.shard AS VARCHAR) || ':' ||
       |                 CAST(s.seq_id AS VARCHAR)), s.seq_id) - 1 AS BIGINT) AS pos,
       |  s.seq_id, s.n_tokens
       |FROM seqs s, ep
       |ORDER BY ep.epoch, s.shard, pos""".stripMargin
  }

  /** The int-form loop on an arbitrary (doc_id, text) frame, formatted
    * to q251's output schema (real-string symbols). */
  def bpeTrainIntFrom(docs: DataFrame, k: Int): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    bpeTrainMergesInt(docs, k).zipWithIndex.map {
      case ((_, _, cnt, ls, rs, m, syms), j) => (j + 1, ls, rs, m, cnt, syms)
    }.toDF("round", "left_sym", "right_sym", "merged", "pair_count", "corpus_syms")
      .orderBy($"round")
  }

  /** The k-round integer-symbol training loop — driver-resident merge
    * table rows are (l, r, cnt, lstr, rstr, merged_str, corpus_syms);
    * merge t's id is BpeSymBase + t. No placeholder corpus filter: the
    * int form has no reserved characters (that is the point), so the
    * char-form equivalence holds on placeholder-free corpora — the
    * char form's own domain. */
  private[graft] def bpeTrainMergesInt(docs: DataFrame, k: Int)
      : Vector[(Int, Int, Long, String, String, String, Long)] = {
    val (m, vocab) = bpeTrainIntWithVocab(docs, k)
    graft.Ckpt.free(vocab)
    m
  }

  /** [[bpeTrainMergesInt]] ALSO returning the trained ENCODED
    * VOCABULARY — the final word table (w, syms, wc): each distinct
    * corpus word with its fully-merged symbol sequence. The vocabulary
    * is the training's natural by-product (the loop rewrites it every
    * round anyway; carrying the word string costs one passthrough
    * column), and it is what makes the ENCODE pass a dictionary JOIN
    * instead of a re-apply — q261. Returned as the loop's last eager
    * localCheckpoint; the caller owns its blocks (free or pin). */
  private[graft] def bpeTrainIntWithVocab(docs: DataFrame, k: Int)
      : (Vector[(Int, Int, Long, String, String, String, Long)],
         DataFrame) = {
    val s = docs.sparkSession
    import s.implicits._
    require(k >= 1, s"k=$k")
    var words = docs
      .select(explode(tokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("wc"))
      .select($"w", transform(sequence(lit(1), length($"w")),
        i => ascii($"w".substr(i, lit(1)))).as("syms"), $"wc")
      .persist()
    var merges = Vector.empty[(Int, Int, Long, String, String, String, Long)]
    var done = false
    def strOf(sym: Int): String =
      if (sym >= BpeSymBase) merges(sym - BpeSymBase - 1)._6
      else new String(Character.toChars(sym))
    def sqlStr(v: String): String = "'" + v.replace("'", "''") + "'"
    try {
      for (t <- 1 to k) {
        val whens = merges.zipWithIndex.map { case ((_, _, _, _, _, m, _), j) =>
          s"WHEN ${BpeSymBase + j + 1} THEN ${sqlStr(m)}"
        }.mkString(" ")
        def trSql(x: String): String =
          if (merges.isEmpty) s"char($x)"
          else s"CASE $x $whens ELSE char($x) END"
        val pc = words
          .select($"wc", explode(zip_with(
            slice($"syms", lit(1), size($"syms") - 1),
            slice($"syms", lit(2), size($"syms") - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
          .groupBy($"p.l", $"p.r").agg(sum($"wc").as("cnt"))
        val dbgT0 = System.nanoTime()
        val bestRows = pc
          .selectExpr("l", "r", "cnt", s"${trSql("l")} AS ls", s"${trSql("r")} AS rs")
          .orderBy($"cnt".desc, $"ls".asc, $"rs".asc).limit(1).collect()
        val dbgT1 = System.nanoTime()
        if (bestRows.isEmpty)
          throw new IllegalStateException(
            s"BPE int training exhausted the corpus at round $t of $k — no adjacent pair left")
        val best = bestRows(0)
        val (l, r, cnt) = (best.getInt(0), best.getInt(1), best.getLong(2))
        val mid = BpeSymBase + t
        val mstr = strOf(l) + strOf(r)
        // the same degenerate-case guard as the char form (ADVICE r16):
        // keeps strOf injective, hence the census tie order total
        require(!merges.exists(_._6 == mstr),
          s"BPE degenerate merge at round $t: '$mstr' was already minted by an earlier round")
        // eager localCheckpoint, NOT persist: a persist caches blocks
        // but keeps the logical lineage, and k nested fold lambdas make
        // the analyzer's per-action cost grow ~1.7x per round (measured
        // 3.1 s/round average at k=16, round 16 alone 23 s, on a
        // CONSTANT-size word table — the 2^k plan bomb in analysis
        // rather than execution). Truncating to a LogicalRDD each round
        // makes every round's plan constant-size (twoStarComponents'
        // rotation discipline); Ckpt.free drops the superseded round's
        // blocks immediately.
        val next = words
          .select($"w", aggregate($"syms", lit(Array.empty[Int]),
            (acc, x) => when(size(acc) > 0 &&
                try_element_at(acc, lit(-1)) === lit(l) && x === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(mid))))
              .otherwise(concat(acc, array(x)))).as("syms"), $"wc")
          .localCheckpoint(true)
        val dbgT2 = System.nanoTime()
        val syms = next.agg(sum($"wc" * size($"syms"))).collect()(0).getLong(0)
        if (sys.env.contains("SPARK_GRAFT_BPE_DEBUG"))
          System.err.println(f"BPEDBG round=$t argmax=${(dbgT1 - dbgT0) / 1e9}%.2f " +
            f"build=${(dbgT2 - dbgT1) / 1e9}%.2f syms=${(System.nanoTime() - dbgT2) / 1e9}%.2f")
        graft.Ckpt.free(words)
        words.unpersist()
        words = next
        merges :+= ((l, r, cnt, strOf(l), strOf(r), mstr, syms))
      }
      done = true
    } finally if (!done) { graft.Ckpt.free(words); words.unpersist() }
    (merges, words)
  }

  /** q264: BPE training at a REALISTIC vocabulary scale via BATCHED
    * merges (VERDICT r17 item 5). The sequential loop pays one driver
    * round-trip per merge — k = 32000 sequential rounds is not a
    * 100 TB plan. The published remedy (batching compatible merges per
    * census round, the SentencePiece/fast-BPE trick) lands here with a
    * PROOF-CARRYING acceptance rule, so the batched table is
    * bit-identical to sequential training — the oracle IS the
    * sequential k=64 replay, so the hash grade proves the equivalence
    * on the live corpus every run:
    *
    *  - walk the census in sequential order (cnt DESC, ls, rs);
    *  - accept a row into the batch iff it shares NO symbol with any
    *    already-accepted pair (disjoint pairs cannot overlap an
    *    occurrence, so earlier batch merges change neither its count
    *    nor its occurrences) AND its count STRICTLY exceeds every
    *    census row sharing a symbol with an earlier accepted pair —
    *    those rows are the only ones whose merges can mint NEW pairs
    *    (a new (x, X_j) occurrence was an (x, l_j) occurrence, so its
    *    count is bounded by a symbol-sharing row's count), and strict
    *    dominance keeps the sequential argmax pointed at the batch;
    *  - stop at the first unsafe candidate (counts only fall down the
    *    order, so nothing later can be safe) or at `mMax`.
    *
    * Every census round then applies its whole batch as stacked fold
    * projections under ONE eager checkpoint and reads the per-stage
    * symbol totals in ONE aggregation — 3 flat-plan driver actions per
    * census round. Since r19 a DELTA-maintained census is available
    * for wide-vocabulary corpora (see [[bpeTrainIntBatched]] — the
    * default here stays full-census because this corpus's 31-word
    * table makes the full explode cheaper than delta's per-round
    * join, measured in BpeCensusStudy). `mMax` bounds the
    * stacked-fold plan depth (the 2^k analyzer lesson, PERF.md r17). */
  def q264BpeTrain64(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    cachedBatched64(s, dir)
      .zipWithIndex.map { case ((_, _, cnt, ls, rs, m, syms), j) =>
        (j + 1, ls, rs, m, cnt, syms)
      }.toDF("round", "left_sym", "right_sym", "merged", "pair_count", "corpus_syms")
      .orderBy($"round")
  }

  private val mergeCacheB64 =
    new graft.SessionCache[Vector[(Int, Int, Long, String, String, String, Long)]](
      label = "bpe_merges_b64")

  private def cachedBatched64(s: SparkSession, dir: String)
      : Vector[(Int, Int, Long, String, String, String, Long)] =
    mergeCacheB64.getOrElseUpdate(s, dir,
      bpeTrainIntBatched(Tables.documents(s, dir), k = 64)._1)

  /** The batched int-symbol training loop — same merge table as
    * [[bpeTrainMergesInt]] (pinned ≡ sequential in LlmSpec and proven
    * per-run by the q264 oracle's sequential replay), in ~k/m census
    * rounds. Returns (merges, censusRounds).
    *
    * Disjointness buys two invariants the proof leans on: (1) merges
    * in one batch cannot overlap an occurrence, so the whole batch
    * applies as ONE left-greedy fold whose branch table is the batch
    * (a minted id is no rule's symbol, so rules stay inert to each
    * other — the plan is ONE flat fold per census round, not m nested
    * ones); (2) each rule's replacement count is exactly its minted
    * id's occurrence count in the batch output, so every SEQUENTIAL
    * intermediate corpus total reconstructs from one aggregation.
    *
    * CENSUS-DELTA maintenance (`deltaCensus` — VERDICT r18 item 5): a
    * full re-census explodes EVERY adjacent pair of EVERY distinct
    * word each round, but a round's merges only change the pair counts
    * of words they actually rewrote. The census lives as a
    * materialized (l, r, cnt) table; each round updates it from the
    * CHANGED words only — (new pairs − old pairs)·wc, a full-outer
    * merge on the 8-byte pair key — so per-round census cost is
    * proportional to the batch's replacement FOOTPRINT plus the
    * distinct-pair table, not the vocabulary. Exactness is inductive
    * (round 1 is the full census; every delta is the exact multiset
    * difference), pinned ≡ full-census and ≡ sequential in LlmSpec
    * and asserted per run by BpeCensusStudy. Delta mode pays 4
    * flat-plan driver actions per census round (top-T collect, fold
    * checkpoint, totals aggregation, census checkpoint) vs full
    * mode's 3.
    *
    * The default is MEASURED, not assumed — and the measurement is a
    * NEGATIVE result worth keeping on the record (BpeCensusStudy,
    * k=64): full census beats delta on the graded corpus (18.6 s vs
    * 31.2 s at sf0.1, 17.9 vs 20.6 at 10× — its word table is a
    * constant 31 rows, the anti-case) AND on a 200k-distinct-word
    * wide-vocabulary corpus (29.4 s vs 53.2 s, 27 census rounds) where
    * each merge rewrites ~1% of the vocabulary and delta "should" win.
    * Why it doesn't, in this architecture: the census groupBy
    * map-side-combines, so the full re-census's shuffle already
    * carries only distinct pairs — the explode itself is ONE linear
    * scan of the word table, comparable to the fold pass every round
    * must pay anyway — while delta adds an eager checkpoint (holding
    * BOTH symbol arrays), a changed-word scan, and a full-outer join,
    * a fixed ~0.5–0.9 s/round that no tested vocabulary amortizes.
    * The crossover needs the census scan alone to exceed that fixed
    * cost — vocabularies of ~10^7+ distinct words on this box — so
    * the knob stays available (pinned bit-identical here and in
    * BpeCensusStudy's per-run assert) but OFF by default. */
  private[graft] def bpeTrainIntBatched(docs: DataFrame, k: Int,
      mMax: Int = 6, topT: Int = 256, deltaCensus: Boolean = false)
      : (Vector[(Int, Int, Long, String, String, String, Long)], Int) = {
    val s = docs.sparkSession
    import s.implicits._
    require(k >= 1, s"k=$k")
    require(mMax >= 1 && topT > mMax, s"mMax=$mMax topT=$topT")
    var words = docs
      .select(explode(tokens($"text")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("wc"))
      .select($"w", transform(sequence(lit(1), length($"w")),
        i => ascii($"w".substr(i, lit(1)))).as("syms"), $"wc")
      .persist()
    var back: DataFrame = words // the checkpointed frame backing `words`
    var census: DataFrame = null // delta mode: materialized (l, r, cnt)
    var merges = Vector.empty[(Int, Int, Long, String, String, String, Long)]
    var rounds = 0
    def strOf(sym: Int): String =
      if (sym >= BpeSymBase) merges(sym - BpeSymBase - 1)._6
      else new String(Character.toChars(sym))
    def sqlStr(v: String): String = "'" + v.replace("'", "''") + "'"
    var done = false
    try {
      while (merges.length < k) {
        rounds += 1
        val whens = merges.zipWithIndex.map { case ((_, _, _, _, _, m, _), j) =>
          s"WHEN ${BpeSymBase + j + 1} THEN ${sqlStr(m)}"
        }.mkString(" ")
        def trSql(x: String): String =
          if (merges.isEmpty) s"char($x)"
          else s"CASE $x $whens ELSE char($x) END"
        lazy val pc = words
          .select($"wc", explode(zip_with(
            slice($"syms", lit(1), size($"syms") - 1),
            slice($"syms", lit(2), size($"syms") - 1),
            (a, b) => struct(a.as("l"), b.as("r")))).as("p"))
          .groupBy($"p.l", $"p.r").agg(sum($"wc").as("cnt"))
        val censusNow =
          if (deltaCensus) {
            if (census == null) census = pc.localCheckpoint(true)
            census
          } else pc
        val top = censusNow
          .selectExpr("l", "r", "cnt", s"${trSql("l")} AS ls", s"${trSql("r")} AS rs")
          .orderBy($"cnt".desc, $"ls".asc, $"rs".asc).limit(topT).collect()
          .map(r => (r.getInt(0), r.getInt(1), r.getLong(2),
            r.getString(3), r.getString(4)))
        if (top.isEmpty)
          throw new IllegalStateException(
            s"BPE batched training exhausted the corpus at merge " +
              s"${merges.length + 1} of $k — no adjacent pair left")
        // rows beyond the collected top-T (if any) can share symbols
        // with whatever we accept — bound them by the last collected
        // count (counts only fall down the order)
        val tailFloor = if (top.length == topT) top.last._3 else 0L
        // tentative batch: maximal greedy disjoint set in census order
        val batchCap = mMax.min(k - merges.length)
        val used = scala.collection.mutable.Set.empty[Int]
        var tentative = Vector.empty[(Int, Int, Long, String, String)]
        for (row @ (l, r, _, _, _) <- top
             if tentative.length < batchCap && !used.contains(l) && !used.contains(r)) {
          tentative :+= row
          used += l; used += r
        }
        // safety trim: position p survives iff its count STRICTLY
        // dominates every census row sharing a symbol with an earlier
        // accepted pair (the only rows whose merges can mint new pairs
        // or rival the argmax at sequential step p); cut at the first
        // violation — the argmax itself (p = 1) is always safe.
        // Minted-pair coverage: a merge (l,r)→X mints pairs (x,X) and
        // (X,y) whose counts are bounded by the ORIGINAL census rows
        // (x,l) / (r,y) — rows that share a symbol with the accepted
        // pair and, by symbol-disjointness of the batch, are never
        // themselves accepted, so they sit in the blocker set… with
        // ONE exception: a SELF-pair (a,a)→X mints (X,a)/(a,X)/(X,X)
        // whose only bounding row is the accepted (a,a) itself
        // (ADVICE r18, corpus 'aaa'×10+'cd'×9). Carry accepted
        // self-pair counts in the blocker floor so later candidates
        // must strictly dominate them too.
        val acceptedSet = tentative.map(t => (t._1, t._2)).toSet
        var batch = Vector(tentative.head)
        var prevSyms = Set(tentative.head._1, tentative.head._2)
        var selfPairFloor =
          if (tentative.head._1 == tentative.head._2) tentative.head._3 else 0L
        var cut = false
        for (cand <- tentative.tail if !cut) {
          val blockerMax = top.iterator
            .filter(r => !acceptedSet.contains((r._1, r._2)) &&
              (prevSyms.contains(r._1) || prevSyms.contains(r._2)))
            .map(_._3).foldLeft(tailFloor max selfPairFloor)(_ max _)
          if (cand._3 > blockerMax) {
            batch :+= cand
            prevSyms += cand._1; prevSyms += cand._2
            if (cand._1 == cand._2) selfPairFloor = selfPairFloor max cand._3
          } else cut = true
        }
        // mint ids in batch order and apply the WHOLE batch as one
        // flat fold pass: at each element the (tail, x) pair selects
        // at most one rule — disjointness makes the branches inert to
        // each other, so one pass ≡ the m sequential passes
        val base = merges.length
        val rules = batch.zipWithIndex.map { case ((l, r, _, _, _), i) =>
          (l, r, BpeSymBase + base + i + 1)
        }
        val folded = aggregate($"syms", lit(Array.empty[Int]), (acc, x) =>
          rules.foldRight(concat(acc, array(x))) { case ((l, r, mid), els) =>
            when(size(acc) > 0 && try_element_at(acc, lit(-1)) === lit(l) &&
                x === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(mid))))
              .otherwise(els)
          })
        // the fold checkpoint carries BOTH the pre- and post-merge
        // symbol arrays: the next word table reads syms2, and delta
        // mode reads (syms, syms2) of the CHANGED words to update the
        // census without re-exploding the whole corpus
        val sel = words.select($"w", $"syms", folded.as("syms2"), $"wc")
          .localCheckpoint(true)
        // one aggregation recovers every sequential intermediate:
        // rule j's replacement count is its minted id's occurrence
        // count (later batch rules never consume a minted id)
        val aggs = sum($"wc" * size($"syms2")).as("total") +:
          rules.map { case (_, _, mid) =>
            sum($"wc" * size(filter($"syms2", x => x === lit(mid)))) }
        val row0 = sel.agg(aggs.head, aggs.tail: _*).collect()(0)
        val totalAfterAll = row0.getLong(0)
        val repl = rules.indices.map(i => row0.getLong(i + 1))
        if (deltaCensus) {
          // merges only shrink arrays, so "changed" == "size shrank";
          // each changed word retracts its old pairs and asserts its
          // new ones at its own weight — the exact multiset difference
          val changed = sel.filter(size($"syms2") < size($"syms"))
          def signedPairs(cn: org.apache.spark.sql.Column,
                          sign: org.apache.spark.sql.Column) =
            transform(zip_with(
              slice(cn, lit(1), size(cn) - 1), slice(cn, lit(2), size(cn) - 1),
              (a, b) => struct(a.as("l"), b.as("r"))),
              p => struct(p.getField("l").as("l"), p.getField("r").as("r"),
                sign.as("d")))
          val delta = changed.select(explode(concat(
              signedPairs($"syms", -$"wc"), signedPairs($"syms2", $"wc"))).as("p"))
            .groupBy($"p.l", $"p.r").agg(sum($"p.d").as("d"))
            .filter($"d" =!= 0)
          val upd = census.join(delta, Seq("l", "r"), "full_outer")
            .select($"l", $"r",
              (coalesce($"cnt", lit(0L)) + coalesce($"d", lit(0L))).as("cnt"))
            .filter($"cnt" > 0)
            .localCheckpoint(true)
          graft.Ckpt.free(census)
          census = upd
        }
        graft.Ckpt.free(back)
        back.unpersist()
        back = sel
        words = sel.select($"w", $"syms2".as("syms"), $"wc")
        batch.zipWithIndex.foreach { case ((l, r, cnt, _, _), i) =>
          val mstr = strOf(l) + strOf(r)
          require(!merges.exists(_._6 == mstr),
            s"BPE degenerate merge at merge ${merges.length + 1}: " +
              s"'$mstr' was already minted by an earlier round")
          // corpus total after THIS batch element = final total plus
          // the replacements of the not-yet-applied later elements
          val syms = totalAfterAll + repl.drop(i + 1).sum
          merges :+= ((l, r, cnt, strOf(l), strOf(r), mstr, syms))
        }
      }
      done = true
    } finally {
      graft.Ckpt.free(back); back.unpersist()
      if (census != null) graft.Ckpt.free(census)
    }
    (merges, rounds)
  }

  /** The k-round int-form training WITH-prefix: w0 = code-point word
    * table; per round the int pair census, the real-string-ordered
    * LIMIT 1 argmax, the list_reduce apply fold (1-int-list lifting so
    * the accumulator type matches the element type), and the symbol
    * total. Word tables and argmaxes MATERIALIZED. Trailing comma.
    * Training is always the shared full-corpus generator — q262 holds
    * out only its ENCODE stream (doc_id%5=0), never the training side. */
  private[llm] def bpeIntRoundCtes(K: Int): String = {
    val rounds = (1 to K).map { t =>
      // mint$t: the minted-id → string dictionary as an ACCUMULATED
      // TABLE (one tiny union + two hash joins per round) instead of
      // the original CASE chains of correlated (SELECT m FROM b$j)
      // scalar subqueries, whose O(K²) planning made the K=64 oracle
      // (q264) take minutes in DuckDB for a 31-word table
      val mintDef =
        if (t == 1)
          s"mint$t AS (SELECT CAST(NULL AS BIGINT) AS mid, CAST(NULL AS VARCHAR) AS m WHERE FALSE),"
        else
          s"mint$t AS MATERIALIZED (SELECT mid, m FROM mint${t - 1} UNION ALL SELECT mid, m FROM b${t - 1}),"
      s"""$mintDef
         |i$t AS (SELECT syms, wc, unnest(generate_series(1, len(syms) - 1)) AS i FROM w${t - 1}),
         |g$t AS MATERIALIZED (
         |  SELECT p.l, p.r, p.cnt,
         |    coalesce(tl.m, chr(p.l)) AS ls, coalesce(tr.m, chr(p.r)) AS rs
         |  FROM (SELECT syms[i] AS l, syms[i + 1] AS r, CAST(sum(wc) AS BIGINT) AS cnt
         |        FROM i$t GROUP BY 1, 2) p
         |  LEFT JOIN mint$t tl ON tl.mid = p.l
         |  LEFT JOIN mint$t tr ON tr.mid = p.r),
         |b$t AS MATERIALIZED (
         |  SELECT l, r, cnt, ls, rs, ls || rs AS m,
         |    ${BpeSymBase + t} AS mid
         |  FROM g$t ORDER BY cnt DESC, ls ASC, rs ASC LIMIT 1),
         |w$t AS MATERIALIZED (
         |  SELECT wt.w, list_reduce(
         |    list_transform(wt.syms, x -> [x]),
         |    (acc, x) -> CASE WHEN len(acc) > 0 AND acc[-1] = b$t.l AND x[1] = b$t.r
         |                THEN list_append(acc[:len(acc) - 1], b$t.mid)
         |                ELSE list_append(acc, x[1]) END) AS syms, wc
         |  FROM w${t - 1} wt, b$t),
         |s$t AS (SELECT CAST(sum(wc * len(syms)) AS BIGINT) AS syms FROM w$t),""".stripMargin
    }.mkString("\n")
    raw"""w0 AS MATERIALIZED (
       |  SELECT tok AS w,
       |    [unicode(tok[i]) FOR i IN generate_series(1, len(tok))] AS syms,
       |    count(*) AS wc
       |  FROM (SELECT unnest(regexp_extract_all(lower(text), '\S+')) AS tok
       |        FROM documents) t
       |  GROUP BY tok),
       |$rounds""".stripMargin
  }

  /** The sequential int-form training oracle at K rounds — shared by
    * q259 (K=16) and q264 (K=64, where the ENGINE is the batched loop,
    * so the hash grade proves batched ≡ sequential on the live corpus
    * every run). */
  private def bpeIntTrainSql(K: Int): String = {
    val out = (1 to K).map { t =>
      s"""  SELECT $t AS round, (SELECT ls FROM b$t) AS left_sym,
         |    (SELECT rs FROM b$t) AS right_sym, (SELECT m FROM b$t) AS merged,
         |    (SELECT cnt FROM b$t) AS pair_count,
         |    (SELECT syms FROM s$t) AS corpus_syms""".stripMargin
    }.mkString("\n  UNION ALL\n")
    s"""WITH ${bpeIntRoundCtes(K)}
       |fin AS (
       |$out
       |)
       |SELECT round, left_sym, right_sym, merged, pair_count, corpus_syms
       |FROM fin ORDER BY round""".stripMargin
  }

  val q259Sql: String = bpeIntTrainSql(16)

  val q264Sql: String = bpeIntTrainSql(64)

  /** q189: SPLIT-LEAKAGE audit — q101's decontamination question asked
    * of the pipeline's OWN train/val/test split (q100's hash rule):
    * per ordered split pair, the shared-shingle mass, its Jaccard, and
    * the count of split-b documents that leak (share ≥1 5-token
    * shingle with split a). Random document-level splits leak by
    * construction whenever near-dups exist — this is the report that
    * says how much, before an eval result gets trusted.
    *
    * Shape: one distinct (split, shingle) projection feeds totals AND
    * the pair intersection (q165's geometry); the doc-leak count is
    * one shingle-keyed semi-join back (q101's shape) counted distinct
    * per (pair, doc). Exact integers, one rounded division. */
  def q189SplitLeakage(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val splitCol =
      when(substring(md5($"doc_id".cast("string")), 1, 1).isin("c", "d"), "val")
        .when(substring(md5($"doc_id".cast("string")), 1, 1).isin("e", "f"), "test")
        .otherwise("train")
    // the shared exploded shingle table (r13 — see Dedup.docShingles;
    // previously a per-query localCheckpoint of the same build); the
    // split label derives from doc_id map-side, no corpus re-join
    val docSh = Dedup.docShingles(s, dir)
      .select($"doc_id", splitCol.as("split"), $"sh")
    val sh = docSh.select($"split", $"sh").distinct()
      .persist() // totals + intersection sides + leak probe; swept per-query (Ckpt.sweep)
    val tot = sh.groupBy($"split").agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        $"a.sh" === $"b.sh" && $"a.split" < $"b.split")
      .groupBy($"a.split".as("split_a"), $"b.split".as("split_b"))
      .agg(count(lit(1)).as("n_shared"))
    val leaked = docSh.select($"doc_id", $"split".as("bs"), $"sh").as("d")
      .join(sh.as("s"), $"d.sh" === $"s.sh" && $"s.split" < $"d.bs")
      .select($"s.split".as("split_a"), $"d.bs".as("split_b"), $"d.doc_id")
      .distinct()
      .groupBy($"split_a", $"split_b")
      .agg(count(lit(1)).as("docs_b_leaked"))
    inter
      .join(broadcast(tot.select($"split".as("ta"), $"n".as("na"))), $"split_a" === $"ta")
      .join(broadcast(tot.select($"split".as("tb"), $"n".as("nb"))), $"split_b" === $"tb")
      .join(leaked, Seq("split_a", "split_b"), "left")
      .select($"split_a", $"split_b", $"n_shared", $"na", $"nb",
        round($"n_shared" / ($"na" + $"nb" - $"n_shared"), 6).as("jaccard"),
        coalesce($"docs_b_leaked", lit(0L)).as("docs_b_leaked"))
      .orderBy($"split_a", $"split_b")
  }

  val q189Sql: String =
    """WITH lab AS (
      |  SELECT doc_id,
      |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d') THEN 'val'
      |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('e','f') THEN 'test'
      |         ELSE 'train' END AS split,
      |    regexp_extract_all(lower(text), '\S+') AS toks
      |  FROM documents),
      |ds AS (
      |  SELECT DISTINCT doc_id, split, unnest(list_distinct([
      |    concat_ws(' ', toks[i], toks[i+1], toks[i+2])
      |    FOR i IN generate_series(1, greatest(len(toks) - 2, 1))])) AS sh
      |  FROM lab),
      |sh AS (SELECT DISTINCT split, sh FROM ds),
      |tot AS (SELECT split, count(*) AS n FROM sh GROUP BY split),
      |inter AS (
      |  SELECT a.split AS split_a, b.split AS split_b, count(*) AS n_shared
      |  FROM sh a JOIN sh b ON a.sh = b.sh AND a.split < b.split
      |  GROUP BY 1, 2),
      |lk AS (
      |  SELECT split_a, split_b, count(*) AS docs_b_leaked FROM (
      |    SELECT DISTINCT s.split AS split_a, d.split AS split_b, d.doc_id
      |    FROM ds d JOIN sh s ON d.sh = s.sh AND s.split < d.split) t
      |  GROUP BY 1, 2)
      |SELECT i.split_a, i.split_b, i.n_shared, ta.n AS na, tb.n AS nb,
      |  round(i.n_shared / (ta.n + tb.n - i.n_shared), 6) AS jaccard,
      |  CAST(coalesce(lk.docs_b_leaked, 0) AS BIGINT) AS docs_b_leaked
      |FROM inter i
      |JOIN tot ta ON i.split_a = ta.split
      |JOIN tot tb ON i.split_b = tb.split
      |LEFT JOIN lk ON lk.split_a = i.split_a AND lk.split_b = i.split_b
      |ORDER BY i.split_a, i.split_b""".stripMargin

  /** q193: BPE ENCODE — close the tokenizer loop: learn q182's two
    * merges on the global word table, APPLY both to every word, and
    * report per-source symbol compression (chars before vs symbols
    * after, weighted by word frequency). The measurement a tokenizer
    * team reads: which sources compress well under the learned merges
    * (repetitive sources compress, novel text resists).
    *
    * Merge 2 is applied in PLACEHOLDER space: after merge 1 rewrites
    * the pair to U+0001, the second chosen pair may itself contain the
    * merged symbol, so its replace target is the raw (placeholder)
    * byte sequence — rank ties still break on the TRANSLATED symbol
    * text so the chosen merges are exactly q182's. All counts are
    * exact integers; the compression ratio is one rounded division. */
  def q193BpeEncode(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ph1 = "\u0001"; val ph2 = "\u0002"
    val srcWords = Tables.documents(s, dir)
      .select($"source", explode(tokens($"text")).as("w"))
      .filter(!$"w".contains(ph1) && !$"w".contains(ph2))
      .groupBy($"source", $"w").agg(count(lit(1)).as("wc"))
    val words = srcWords.groupBy($"w").agg(sum($"wc").as("wc"))
    def chars(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      transform(sequence(lit(1), length(c)), i => c.substr(i, lit(1)))
    def rawPairs(df: DataFrame): DataFrame = {
      val cs = chars($"w")
      df.select($"wc", explode(zip_with(
          slice(cs, lit(1), size(cs) - 1), slice(cs, lit(2), size(cs) - 1),
          (a, b) => struct(a.as("rl"), b.as("rr")))).as("p"))
        .groupBy($"p.rl".as("rl"), $"p.rr".as("rr"))
        .agg(sum($"wc").as("cnt"))
    }
    val best1 = rawPairs(words)
      .withColumn("rk", row_number().over(
        Window.orderBy($"cnt".desc, $"rl".asc, $"rr".asc)))
      .filter($"rk" === 1)
      .select(concat($"rl", $"rr").as("m1"))
    val w2 = words.crossJoin(broadcast(best1))
      .select(org.apache.spark.sql.functions.replace($"w", $"m1", lit(ph1)).as("w"),
        $"wc", $"m1")
    val best2 = rawPairs(w2)
      .join(broadcast(best1))
      .withColumn("rk", row_number().over(Window.orderBy($"cnt".desc,
        when($"rl" === ph1, $"m1").otherwise($"rl").asc,
        when($"rr" === ph1, $"m1").otherwise($"rr").asc)))
      .filter($"rk" === 1)
      .select($"m1", concat($"rl", $"rr").as("m2raw"))
    srcWords.crossJoin(broadcast(best2))
      .withColumn("enc",
        org.apache.spark.sql.functions.replace(
          org.apache.spark.sql.functions.replace($"w", $"m1", lit(ph1)),
          $"m2raw", lit(ph2)))
      .groupBy($"source")
      .agg(sum($"wc").as("n_words"),
        sum(length($"w") * $"wc").as("chars_before"),
        sum(length($"enc") * $"wc").as("syms_after"))
      .withColumn("compression",
        round($"syms_after".cast("double") / $"chars_before", 4))
      .orderBy($"source")
  }

  val q193Sql: String =
    """WITH ws AS (
      |  SELECT source, tok AS w, count(*) AS wc FROM (
      |    SELECT source, unnest(regexp_extract_all(lower(text), '\S+')) AS tok
      |    FROM documents) t
      |  WHERE strpos(tok, chr(1)) = 0 AND strpos(tok, chr(2)) = 0
      |  GROUP BY source, tok),
      |w AS (SELECT w, CAST(sum(wc) AS BIGINT) AS wc FROM ws GROUP BY w),
      |i1 AS (SELECT w, wc, unnest(generate_series(1, len(w) - 1)) AS i FROM w),
      |g1 AS (SELECT substring(w, i, 1) AS rl, substring(w, i + 1, 1) AS rr,
      |              CAST(sum(wc) AS BIGINT) AS cnt
      |       FROM i1 GROUP BY 1, 2),
      |r1 AS (SELECT rl, rr, cnt,
      |         row_number() OVER (ORDER BY cnt DESC, rl ASC, rr ASC) AS rk FROM g1),
      |b1 AS (SELECT rl || rr AS m1 FROM r1 WHERE rk = 1),
      |w2 AS (SELECT replace(w, (SELECT m1 FROM b1), chr(1)) AS w, wc FROM w),
      |i2 AS (SELECT w, wc, unnest(generate_series(1, len(w) - 1)) AS i FROM w2),
      |g2 AS (SELECT substring(w, i, 1) AS rl, substring(w, i + 1, 1) AS rr,
      |              CAST(sum(wc) AS BIGINT) AS cnt
      |       FROM i2 GROUP BY 1, 2),
      |r2 AS (SELECT rl, rr, cnt,
      |         row_number() OVER (ORDER BY cnt DESC,
      |           CASE WHEN rl = chr(1) THEN (SELECT m1 FROM b1) ELSE rl END ASC,
      |           CASE WHEN rr = chr(1) THEN (SELECT m1 FROM b1) ELSE rr END ASC) AS rk
      |       FROM g2),
      |b2 AS (SELECT rl || rr AS m2raw FROM r2 WHERE rk = 1),
      |enc AS (
      |  SELECT source, w, wc,
      |    replace(replace(w, (SELECT m1 FROM b1), chr(1)),
      |            (SELECT m2raw FROM b2), chr(2)) AS e
      |  FROM ws)
      |SELECT source, CAST(sum(wc) AS BIGINT) AS n_words,
      |  CAST(sum(len(w) * wc) AS BIGINT) AS chars_before,
      |  CAST(sum(len(e) * wc) AS BIGINT) AS syms_after,
      |  round(CAST(sum(len(e) * wc) AS DOUBLE) / sum(len(w) * wc), 4) AS compression
      |FROM enc GROUP BY source ORDER BY source""".stripMargin

  /** q201: per-source exact-duplicate RATE — the dedup health report:
    * per source, document count, distinct normalized fingerprints
    * (q33's normFp), droppable exact copies, the dup rate, and the
    * widest clone group. The management-summary rollup of q29's
    * per-hash keeper table — what a pipeline dashboard shows per feed.
    * (A cross-source fingerprint-overlap variant was drafted first and
    * returned ZERO rows on this corpus — its near-dups are strictly
    * within-source — so the graded surface is the within-source rate,
    * which the corpus genuinely exercises.) One (source, fp)
    * aggregation + one per-source rollup; the rate is one rounded
    * division of exact integers. */
  def q201SourceDupRate(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    Tables.documents(s, dir)
      .select($"source", normFp($"text").as("fp"))
      .groupBy($"source", $"fp").agg(count(lit(1)).as("c"))
      .groupBy($"source")
      .agg(sum($"c").as("n_docs"),
        count(lit(1)).as("n_distinct"),
        (sum($"c") - count(lit(1))).as("dup_docs"),
        max($"c").as("max_clone_group"))
      .withColumn("dup_rate",
        round($"dup_docs".cast("double") / $"n_docs", 4))
      .orderBy($"source")
  }

  val q201Sql: String =
    """WITH g AS (
      |  SELECT source,
      |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
      |    count(*) AS c
      |  FROM documents GROUP BY 1, 2)
      |SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
      |  count(*) AS n_distinct,
      |  CAST(sum(c) - count(*) AS BIGINT) AS dup_docs,
      |  CAST(max(c) AS BIGINT) AS max_clone_group,
      |  round(CAST(sum(c) - count(*) AS DOUBLE) / sum(c), 4) AS dup_rate
      |FROM g GROUP BY source ORDER BY source""".stripMargin

  /** q216: k-ANONYMITY audit — the release-side privacy complement of
    * q103's PII redaction: after redaction, can a document still be
    * singled out by its quasi-identifiers? Quasi-identifier tuple here
    * = (lang, source, 500-char length band capped at band 7); every
    * equivalence class of size k < 5 is an at-risk class (k-anonymity
    * at the conventional k=5 floor). Output is the full class census
    * with k and the flag — the table a compliance review reads before
    * an export ships.
    *
    * Scale: one map-side-combining hash aggregation over a bounded key
    * space (langs × sources × 8 bands) — 10⁹ documents cost one narrow
    * scan; the flag is a projection over the aggregate. */
  def q216KAnonymity(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.Tables.documents(s, dir)
      .withColumn("len_band", least(expr("n_chars div 500"), lit(7L)))
      .groupBy($"lang", $"source", $"len_band")
      .agg(count(lit(1)).as("k"))
      .withColumn("at_risk", $"k" < 5)
      .orderBy($"lang", $"source", $"len_band")
  }

  val q216Sql: String =
    """SELECT lang, source, least(n_chars // 500, 7) AS len_band,
      |       count(*) AS k, count(*) < 5 AS at_risk
      |FROM documents
      |GROUP BY 1, 2, 3
      |ORDER BY lang, source, len_band""".stripMargin

  /** q222: cross-source QUALITY CALIBRATION — every document's quality
    * score (q32's stop-word ratio) mapped to its POOLED corpus
    * percentile, then summarized per source by order statistics: a
    * source whose median pooled percentile sits far below 0.5 is
    * systematically low-quality RELATIVE TO THE CORPUS — the comparison
    * a mixture planner actually needs (absolute score thresholds drift
    * per snapshot; pooled ranks do not). The pooled rank is made total
    * by (ratio, doc_id), so every percentile is (rank−1)/(N−1) —
    * identical integers, hence bit-identical doubles on both engines —
    * and the per-source summaries are percentile_disc COPIES of those
    * values (no FP summation anywhere; q171's parity).
    *
    * Scale: the exact pooled rank is a total order — the graded
    * DEFINITION (q197's discipline). The 100 TB production form reuses
    * q213's machinery verbatim: approx_percentile boundaries broadcast,
    * each document mapped to its percentile bucket map-side. */
  def q222SourceCalibration(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = Tables.documents(s, dir)
      .withColumn("toks", tokens($"text"))
      .withColumn("n_stop", size(expr(s"filter(toks, x -> x IN $stopSqlList)")))
      .withColumn("ratio", round($"n_stop".cast("double") / size($"toks"), 4))
      .select($"doc_id", $"source", $"ratio")
    val w = org.apache.spark.sql.expressions.Window.orderBy($"ratio", $"doc_id")
    scored.withColumn("pool_pct", percent_rank().over(w))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY pool_pct)").as("p25_pool"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY pool_pct)").as("p50_pool"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY pool_pct)").as("p75_pool"))
      .withColumn("low_vs_corpus", $"p50_pool" < 0.4)
      .orderBy($"source")
  }

  /** q227: q222's PRODUCTION form, registered and graded (VERDICT r11
    * item 2) — the cross-source calibration summary computed from
    * approx_percentile DECILE BOUNDARIES instead of the exact pooled
    * total order. The 9 inner boundaries of the pooled quality-ratio
    * distribution come from ONE aggregation of mergeable
    * Greenwald–Khanna sketches (map-side partials, no total order
    * anywhere); each document is mapped to its pooled decile by
    * counting boundaries below its ratio (a 9-value broadcast
    * evaluated map-side, q213's machinery verbatim); per source the
    * median pooled decile is a percentile_disc COPY of those integer
    * deciles. Every stage survives a 1000-executor 100 TB scan —
    * exactly what q222's global percent_rank window does not; q222
    * stays the graded exact DEFINITION (q197/q213's twin discipline).
    *
    * Sketch boundaries are engine-specific bits, so the graded columns
    * follow q213: the exact per-source doc count, and the calibration
    * verdicts THROUGH the boolean/band contract. The verdict cuts are
    * deciles 3/8 — NOT the tempting 4/7 (r12 shipped 4/7 and ADVICE
    * r12 caught it): a verdict cut reduces to comparing each source's
    * median ratio against one pooled boundary value, and this corpus
    * masses its per-source medians between the 0.4 and 0.7 boundaries
    * (measured: src9's median sat 0.0004 — four rounding quanta — above
    * the 0.6 boundary, so any t-digest/GK disagreement there flips the
    * flag). The 3/8 cuts sit outside that mass band with >= 0.002
    * value-margin on every source (~20 quanta, vs sketch boundary error
    * <= ~1 quantum at n=500); LlmSpec pins the margin on the graded
    * corpus so drift erodes it loudly at `sbt test`, not as a
    * confusing driver hash-mismatch a round later. */
  def q227CalibrationSketch(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val scored = Tables.documents(s, dir)
      .withColumn("toks", tokens($"text"))
      .withColumn("n_stop", size(expr(s"filter(toks, x -> x IN $stopSqlList)")))
      .withColumn("ratio", round($"n_stop".cast("double") / size($"toks"), 4))
      .select($"source", $"ratio")
      // feeds the boundary sketch AND the decile probe side — without
      // this the tokenize+stop-filter scan (the query's dominant cost)
      // runs twice; r13's 10x decade point measured the double scan
      // before this landed (freed by Ckpt.sweep after the query)
      .persist()
    val b = scored.agg(
      expr("approx_percentile(ratio, " +
        "array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D), 10000)").as("bs"))
    scored.crossJoin(broadcast(b))
      .withColumn("decile",
        expr("1 + aggregate(bs, 0, (acc, x) -> " +
          "acc + (CASE WHEN ratio > x THEN 1 ELSE 0 END))"))
      .groupBy($"source")
      .agg(count(lit(1)).as("n_docs"),
        expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY decile)").as("p50d"))
      .select($"source", $"n_docs",
        ($"p50d" <= 3).as("low_vs_corpus"),
        ($"p50d" >= 8).as("high_vs_corpus"))
      .orderBy($"source")
  }

  val q227Sql: String =
    raw"""WITH sc AS (
      |  SELECT source,
      |    round(CAST(len(list_filter(toks, x -> x IN $stopSqlList)) AS DOUBLE)
      |          / len(toks), 4) AS ratio
      |  FROM (SELECT source, regexp_extract_all(lower(text), '\S+') AS toks
      |        FROM documents) t),
      |b AS (
      |  SELECT approx_quantile(ratio,
      |           [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bs
      |  FROM sc),
      |a AS (
      |  SELECT sc.source,
      |    CAST(1 + len(list_filter(b.bs, x -> sc.ratio > x)) AS INT) AS decile
      |  FROM sc CROSS JOIN b)
      |SELECT source, count(*) AS n_docs,
      |  quantile_disc(decile, 0.5) <= 3 AS low_vs_corpus,
      |  quantile_disc(decile, 0.5) >= 8 AS high_vs_corpus
      |FROM a GROUP BY source ORDER BY source""".stripMargin

  val q222Sql: String =
    raw"""WITH sc AS (
      |  SELECT doc_id, source,
      |    round(CAST(len(list_filter(toks, x -> x IN $stopSqlList)) AS DOUBLE)
      |          / len(toks), 4) AS ratio
      |  FROM (SELECT doc_id, source, regexp_extract_all(lower(text), '\S+') AS toks
      |        FROM documents) t),
      |p AS (
      |  SELECT source, percent_rank() OVER (ORDER BY ratio, doc_id) AS pool_pct
      |  FROM sc)
      |SELECT source, count(*) AS n_docs,
      |  quantile_disc(pool_pct, 0.25) AS p25_pool,
      |  quantile_disc(pool_pct, 0.5) AS p50_pool,
      |  quantile_disc(pool_pct, 0.75) AS p75_pool,
      |  quantile_disc(pool_pct, 0.5) < 0.4 AS low_vs_corpus
      |FROM p GROUP BY source ORDER BY source""".stripMargin

  /** q230: unigram-LM quality banding — the CCNet-family language-model
    * quality split (Wenzek et al. 2020, public: score each document
    * with a corpus-trained LM, band the corpus by score). The scorer
    * here is the corpus's own unigram occurrence model reduced to
    * EXACT INTEGERS: per token its corpus occurrence count df, per
    * document the commonness c = Σdf / n_tokens — the integer-exact
    * surrogate of mean unigram log-probability (monotone in the model
    * the production pipeline would use; log-prob itself sums
    * non-associative doubles whose bits differ across engines, the
    * exact reason this form is graded instead). Banding is
    * MEAN-RELATIVE per language, not percentile: with L = ΣΣdf / Σn
    * the language's token-weighted mean commonness,
    * rare ⟺ 100·Σdf·LT < 99·L_num·n and common ⟺ 100·Σdf·LT > 101·L_num·n
    * (±1% — the synthetic corpus concentrates per-doc commonness
    * within ±3.5% of its language mean, measured p1/p99 = 0.968/1.014,
    * so ±1% splits it ~7% rare / ~10% common / rest mid; the cut is
    * exact integer arithmetic, so ANY cut is cross-engine-safe — the
    * choice only tunes how much of each band the grade exercises)
    * — pure integer cross-multiplication, so the band of every document
    * is bit-identical on any engine at any partial-aggregation order,
    * and there is NO total order anywhere: two hash aggregations and a
    * broadcast of per-language scalars, every stage 100 TB-safe. (The
    * CCNet paper cuts by cumulative-percentile instead — that is a
    * pooled order statistic, exactly q222's graded-definition class;
    * q232 is that production form, graded through q213's sketch
    * discipline.)
    * Overflow safety (ADVICE r13): the guard products run through
    * DECIMAL(38,0) on the Spark side and HUGEINT (int128) in the
    * oracle — both exact, order-independent, and ~10^22 above the
    * largest product a 100 TB corpus can form (Σdf·Σn ≤ ~10^16 even at
    * the 10× study point), so a bigger corpus can never wrap a Long
    * silently under Spark's non-ANSI default and flip a band. */
  def q230RarityBands(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // spread + EAGER cut (optimization r19): the tokenize+explode scan
    // feeds the vocabulary aggregation AND the join probe side (the
    // q227 lesson), but the single-split scan left the cached frame
    // one partition — every consumer subtree ran serial, back to back
    // (profiled: four ~435 ms single-task stages). Spread to cluster
    // width first; the eager checkpoint runs the scan exactly once.
    val tk = graft.Tables.spread(Tables.documents(s, dir), "doc_id")
      .select($"doc_id", $"lang", explode(tokens($"text")).as("tok"))
      .localCheckpoint(true)
    val dfreq = tk.groupBy($"tok").agg(count(lit(1)).as("df"))
    val scored = tk.join(dfreq, "tok")
      .groupBy($"doc_id", $"lang")
      .agg(sum($"df").as("df_sum"), count(lit(1)).as("n_toks"))
    val langRef = scored.groupBy($"lang".as("l2"))
      .agg(sum($"df_sum").as("l_num"), sum($"n_toks").as("l_den"))
    val d38 = (c: org.apache.spark.sql.Column) =>
      c.cast(org.apache.spark.sql.types.DecimalType(38, 0))
    scored.join(broadcast(langRef), $"lang" === $"l2")
      .select($"doc_id", $"lang", $"n_toks", $"df_sum",
        round($"df_sum".cast("double") / $"n_toks", 2).as("commonness"),
        when(d38($"df_sum") * $"l_den" * 100 < d38($"l_num") * $"n_toks" * 99, "rare")
          .when(d38($"df_sum") * $"l_den" * 100 > d38($"l_num") * $"n_toks" * 101, "common")
          .otherwise("mid").as("band"))
      .orderBy($"doc_id")
  }

  val q230Sql: String =
    raw"""WITH tk AS (
      |  SELECT doc_id, lang, unnest(toks) AS tok
      |  FROM (SELECT doc_id, lang, regexp_extract_all(lower(text), '\S+') AS toks
      |        FROM documents) t),
      |dfreq AS (SELECT tok, count(*) AS df FROM tk GROUP BY tok),
      |scored AS (
      |  SELECT doc_id, lang, CAST(sum(df) AS BIGINT) AS df_sum,
      |         count(*) AS n_toks
      |  FROM tk JOIN dfreq USING (tok) GROUP BY doc_id, lang),
      |ref AS (
      |  SELECT lang, CAST(sum(df_sum) AS BIGINT) AS l_num,
      |         CAST(sum(n_toks) AS BIGINT) AS l_den
      |  FROM scored GROUP BY lang)
      |SELECT s.doc_id, s.lang, s.n_toks, s.df_sum,
      |  round(CAST(s.df_sum AS DOUBLE) / s.n_toks, 2) AS commonness,
      |  CASE WHEN CAST(s.df_sum AS HUGEINT) * r.l_den * 100
      |              < CAST(r.l_num AS HUGEINT) * s.n_toks * 99 THEN 'rare'
      |       WHEN CAST(s.df_sum AS HUGEINT) * r.l_den * 100
      |              > CAST(r.l_num AS HUGEINT) * s.n_toks * 101 THEN 'common'
      |       ELSE 'mid' END AS band
      |FROM scored s JOIN ref r USING (lang)
      |ORDER BY doc_id""".stripMargin

  /** q232: CCNet PERCENTILE-CUT rarity bands — q230's PRODUCTION twin,
    * registered and graded (VERDICT r13 item 1). CCNet (Wenzek et al.
    * 2020, arXiv:1911.00359) does not band by mean-relative guards:
    * it cuts each language's corpus into head / middle / tail THIRDS
    * by the cumulative percentile of the LM score — a pooled order
    * statistic, exactly q222's graded-definition class. The 100 TB
    * form is q227/q213's machinery applied per language:
    *  1. score: q230's integer-exact commonness c = Σdf / n_tokens
    *     (two hash aggregations; one IEEE division of exact BIGINTs,
    *     so every c is bit-identical on both engines);
    *  2. boundaries: per language, the 1/3 and 2/3 quantiles of c from
    *     ONE aggregation of mergeable Greenwald–Khanna sketches
    *     (map-side partials, no total order anywhere) — a
    *     5-language × 2-value broadcast;
    *  3. band: each document compared to ITS language's boundaries
    *     map-side (tail ⟺ c ≤ b⅓, head ⟺ c > b⅔, else middle);
    *  4. census: per (lang, band) an ordinary hash aggregation.
    * Every stage survives a 1000-executor 100 TB scan.
    *
    * Sketch boundaries are engine-specific bits (GK here, t-digest in
    * DuckDB), so the graded columns follow q213's discipline verbatim:
    * the band id, the EXACT per-language doc count, and each engine's
    * OWN mass boolean — did its sketch put each band within 10% of the
    * equi-mass n/3 (the percentile-cut semantic contract), its own
    * boundaries judged against its own counts. The 10% tolerance is
    * margin-calibrated: at sf0.01 the worst engine-side deviation is
    * ≤ ~3 docs on the smallest language (n=64) vs a 6.4-doc allowance,
    * and the allowance grows linearly with n while sketch error does
    * not (GK error ≤ n/10000 at this accuracy) — LlmSpec pins the
    * margin so corpus drift erodes it at `sbt test`, not as a driver
    * hash-mismatch a round later. */
  /** q239: GOPHER RULE FILTERS — the published heuristic quality-rule
    * set of Rae et al. 2021 (Gopher, arXiv:2112.11446 Appendix A,
    * public; reused near-verbatim by MassiveText/RedPajama/Dolma-class
    * pipelines) evaluated in ONE narrow scan, each rule an EXACT
    * INTEGER comparison (cross-multiplied thresholds — no ratio ever
    * becomes a double), so every flag is hash-exact:
    *  - word count ∈ [50, 100000];
    *  - mean word length ∈ [3, 10]  ⟺  3n ≤ Σlen ≤ 10n;
    *  - symbol-to-word ratio ≤ 0.1 ('#' and '…' spelled '...')
    *    ⟺ 10·n_sym ≤ n_words;
    *  - ≥ 70% of words carry an alphabetic character
    *    ⟺ 10·n_alpha ≥ 7·n_words;
    *  - ≥ 2 stop words (the shared [[Stopwords]] list).
    * (The paper's bullet/ellipsis LINE rules need multi-line text; this
    * corpus is single-line, so they would be constant-true noise and
    * are left to the symbol rule that subsumes their intent.) On the
    * graded corpus the word-count and stop-word rules discriminate
    * (277/500 and 224/500 pass at sf0.01); the other three hold
    * corpus-wide at the published constants — kept at those constants
    * rather than retuned, because the POINT of rule filters is that the
    * thresholds are fixed and portable. One scan, all-codegen scalar
    * functions, no shuffle before the per-doc projection: I/O-bound at
    * any corpus size. Length terms are CHARACTER lengths on both
    * engines (Spark `length`, DuckDB `length` — NOT `strlen`, which is
    * bytes and diverges on any non-ASCII text; ADVICE r14). */
  def q239GopherRules(s: SparkSession, dir: String): DataFrame =
    gopherRulesFrom(Tables.documents(s, dir))

  /** q239's engine on an arbitrary (doc_id, text) frame — split out so
    * LlmSpec can pin the rules that hold corpus-wide on the graded data
    * (symbol, alpha, mean-word-length) against CONSTRUCTED violations. */
  def gopherRulesFrom(docs: DataFrame): DataFrame = {
    val s = docs.sparkSession
    import s.implicits._
    docs
      .withColumn("toks", tokens($"text"))
      .withColumn("n_words", size($"toks").cast("long"))
      .withColumn("sum_len",
        expr("aggregate(toks, 0L, (acc, x) -> acc + length(x))"))
      .withColumn("n_alpha",
        size(expr("filter(toks, x -> x rlike '[a-z]')")).cast("long"))
      .withColumn("n_sym",
        (length($"text") - length(regexp_replace($"text", "#", ""))).cast("long") +
          ((length($"text") - length(regexp_replace($"text", "\\.\\.\\.", ""))) / 3).cast("long"))
      .withColumn("n_stop",
        size(expr(s"filter(toks, x -> x IN $stopSqlList)")).cast("long"))
      .select($"doc_id", $"n_words",
        ($"n_words" >= 50 && $"n_words" <= 100000).as("wc_ok"),
        (lit(3) * $"n_words" <= $"sum_len" && $"sum_len" <= lit(10) * $"n_words")
          .as("mwl_ok"),
        (lit(10) * $"n_sym" <= $"n_words").as("sym_ok"),
        (lit(10) * $"n_alpha" >= lit(7) * $"n_words").as("alpha_ok"),
        ($"n_stop" >= 2).as("stop_ok"))
      .withColumn("gopher_pass",
        $"wc_ok" && $"mwl_ok" && $"sym_ok" && $"alpha_ok" && $"stop_ok")
      .orderBy($"doc_id")
  }

  val q239Sql: String =
    raw"""WITH t AS (
      |  SELECT doc_id, text, regexp_extract_all(lower(text), '\S+') AS toks
      |  FROM documents),
      |m AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n_words,
      |    CAST(list_sum(list_transform(toks, x -> length(x))) AS BIGINT) AS sum_len,
      |    CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha,
      |    CAST(length(text) - length(replace(text, '#', ''))
      |      + (length(text) - length(replace(text, '...', ''))) // 3 AS BIGINT) AS n_sym,
      |    CAST(len(list_filter(toks, x -> x IN $stopSqlList)) AS BIGINT) AS n_stop
      |  FROM t)
      |SELECT doc_id, n_words,
      |  n_words >= 50 AND n_words <= 100000 AS wc_ok,
      |  3 * n_words <= sum_len AND sum_len <= 10 * n_words AS mwl_ok,
      |  10 * n_sym <= n_words AS sym_ok,
      |  10 * n_alpha >= 7 * n_words AS alpha_ok,
      |  n_stop >= 2 AS stop_ok,
      |  (n_words >= 50 AND n_words <= 100000)
      |    AND (3 * n_words <= sum_len AND sum_len <= 10 * n_words)
      |    AND 10 * n_sym <= n_words
      |    AND 10 * n_alpha >= 7 * n_words
      |    AND n_stop >= 2 AS gopher_pass
      |FROM m ORDER BY doc_id""".stripMargin

  /** q232's banded census — (lang, band, nb, n_lang) BEFORE the graded
    * boolean — split out so LlmSpec's margin pin measures the
    * PRODUCTION plan's own band counts (CODE-REVIEW r14: a copy-pasted
    * pipeline in the spec would keep validating the old plan if the
    * sketch accuracy or band rule ever changed here). */
  private[graft] def rarityTertileCounts(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    // spread + EAGER cut — q230's story verbatim (optimization r19)
    val tk = graft.Tables.spread(Tables.documents(s, dir), "doc_id")
      .select($"doc_id", $"lang", explode(tokens($"text")).as("tok"))
      .localCheckpoint(true)
    val dfreq = tk.groupBy($"tok").agg(count(lit(1)).as("df"))
    val scored = tk.join(dfreq, "tok")
      .groupBy($"doc_id", $"lang")
      .agg((sum($"df").cast("double") / count(lit(1))).as("c"))
    val b = scored.groupBy($"lang".as("l2")).agg(
      expr("approx_percentile(c, array(CAST(1.0D/3.0D AS DOUBLE), " +
        "CAST(2.0D/3.0D AS DOUBLE)), 10000)").as("bs"),
      count(lit(1)).as("n_lang"))
    scored.join(broadcast(b), $"lang" === $"l2")
      .withColumn("band",
        when($"c" <= element_at($"bs", 1), "tail")
          .when($"c" > element_at($"bs", 2), "head")
          .otherwise("middle"))
      .groupBy($"lang", $"band")
      .agg(count(lit(1)).as("nb"), first($"n_lang").as("n_lang"))
  }

  def q232RarityTertiles(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    rarityTertileCounts(s, dir)
      .select($"lang", $"band", $"n_lang",
        (abs($"nb" - $"n_lang" / lit(3.0)) <= $"n_lang" * lit(0.10))
          .as("mass_ok"))
      .orderBy($"lang", $"band")
  }

  val q232Sql: String =
    raw"""WITH tk AS (
      |  SELECT doc_id, lang, unnest(toks) AS tok
      |  FROM (SELECT doc_id, lang, regexp_extract_all(lower(text), '\S+') AS toks
      |        FROM documents) t),
      |dfreq AS (SELECT tok, count(*) AS df FROM tk GROUP BY tok),
      |scored AS (
      |  SELECT doc_id, lang, CAST(sum(df) AS DOUBLE) / count(*) AS c
      |  FROM tk JOIN dfreq USING (tok) GROUP BY doc_id, lang),
      |b AS (
      |  SELECT lang AS l2,
      |    approx_quantile(c, [CAST(1.0/3.0 AS FLOAT), CAST(2.0/3.0 AS FLOAT)]) AS bs,
      |         count(*) AS n_lang
      |  FROM scored GROUP BY lang),
      |a AS (
      |  SELECT s.lang, b.n_lang,
      |    CASE WHEN s.c <= b.bs[1] THEN 'tail'
      |         WHEN s.c > b.bs[2] THEN 'head'
      |         ELSE 'middle' END AS band
      |  FROM scored s JOIN b ON b.l2 = s.lang)
      |SELECT lang, band, any_value(n_lang) AS n_lang,
      |  abs(count(*) - any_value(n_lang) / 3.0)
      |    <= any_value(n_lang) * 0.10 AS mass_ok
      |FROM a GROUP BY lang, band
      |ORDER BY lang, band""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q239_gopher_rules" -> (q239GopherRules _),
    "q232_rarity_tertiles" -> (q232RarityTertiles _),
    "q230_rarity_bands" -> (q230RarityBands _),
    "q227_calibration_sketch" -> (q227CalibrationSketch _),
    "q222_source_calibration" -> (q222SourceCalibration _),
    "q216_k_anonymity"  -> (q216KAnonymity _),
    "q201_source_dup_rate" -> (q201SourceDupRate _),
    "q193_bpe_encode"   -> (q193BpeEncode _),
    "q189_split_leakage" -> (q189SplitLeakage _),
    "q182_bpe_merges"   -> (q182BpeMerges _),
    "q177_bigram_novelty" -> (q177BigramNovelty _),
    "q160_quality_band" -> (q160QualityBand _),
    "q165_source_overlap" -> (q165SourceOverlap _),
    "q102_chunking"     -> (q102Chunking _),
    "q103_pii_redaction" -> (q103PiiRedaction _),
    "q115_repetition"   -> (q115Repetition _),
    "q116_seq_packing"  -> (q116SeqPacking _),
    "q67_bpe_tokens"    -> (q67BpeTokens _),
    "q29_dedup_exact"   -> (q29DedupExact _),
    "q30_token_count"   -> (q30TokenCount _),
    "q31_lang_stats"    -> (q31LangStats _),
    "q32_quality_score" -> (q32QualityScore _),
    "q33_fingerprint"   -> (q33Fingerprint _),
    "q34_jaccard_pairs" -> (q34JaccardPairs _),
    "q35_lang_id"       -> (q35LangId _),
    "q100_data_split"   -> (q100DataSplit _),
    "q101_decontamination" -> (q101Decontamination _),
    "q245_memorization_scan" -> (q245MemorizationScan _),
    "q248_memorization_hashed" -> (q248MemorizationHashed _),
    "q258_decontam_scan" -> (q258DecontamScan _),
    "q259_bpe_train16" -> (q259BpeTrain16 _),
    "q261_bpe_encode16" -> (q261BpeEncode16 _),
    "q262_bpe_encode_oov" -> (q262BpeEncodeOov _),
    "q264_bpe_train64" -> (q264BpeTrain64 _),
    "q266_bpe_id_stream" -> (q266BpeIdStream _),
    "q274_bpe_decode" -> (q274BpeDecode _),
    "q270_seq_pack_ids" -> (q270SeqPackIds _),
    "q272_seq_boundary_map" -> (q272SeqBoundaryMap _),
    "q279_seq_shuffle_plan" -> (q279SeqShufflePlan _),
    "q251_bpe_train" -> (q251BpeTrain _),
    "q256_bpe_encode8" -> (q256BpeEncode8 _),
  )

  val oracle: Map[String, String] = Map(
    "q239_gopher_rules" -> q239Sql,
    "q232_rarity_tertiles" -> q232Sql,
    "q230_rarity_bands" -> q230Sql,
    "q227_calibration_sketch" -> q227Sql,
    "q222_source_calibration" -> q222Sql,
    "q216_k_anonymity"  -> q216Sql,
    "q201_source_dup_rate" -> q201Sql,
    "q193_bpe_encode"   -> q193Sql,
    "q189_split_leakage" -> q189Sql,
    "q182_bpe_merges"   -> q182Sql,
    "q177_bigram_novelty" -> q177Sql,
    "q160_quality_band" -> q160Sql,
    "q165_source_overlap" -> q165Sql,
    "q102_chunking"     -> q102Sql,
    "q103_pii_redaction" -> q103Sql,
    "q115_repetition"   -> q115Sql,
    "q116_seq_packing"  -> q116Sql,
    "q67_bpe_tokens"    -> q67Sql,
    "q29_dedup_exact"   -> q29Sql,
    "q30_token_count"   -> q30Sql,
    "q31_lang_stats"    -> q31Sql,
    "q32_quality_score" -> q32Sql,
    "q33_fingerprint"   -> q33Sql,
    "q34_jaccard_pairs" -> q34Sql,
    "q35_lang_id"       -> q35Sql,
    "q100_data_split"   -> q100Sql,
    "q101_decontamination" -> q101Sql,
    "q245_memorization_scan" -> q245Sql,
    // hash-graded via fixtures/q248_gramhash_sf001 (q46/q48 discipline)
    "q248_memorization_hashed" -> q248Sql,
    "q258_decontam_scan" -> q258Sql,
    "q259_bpe_train16" -> q259Sql,
    "q261_bpe_encode16" -> q261Sql,
    "q262_bpe_encode_oov" -> q262Sql,
    "q264_bpe_train64" -> q264Sql,
    "q266_bpe_id_stream" -> q266Sql,
    "q274_bpe_decode" -> q274Sql,
    "q270_seq_pack_ids" -> q270Sql,
    "q272_seq_boundary_map" -> q272Sql,
    "q279_seq_shuffle_plan" -> q279Sql,
    "q251_bpe_train" -> q251Sql,
    "q256_bpe_encode8" -> q256Sql,
  )
}

/** The executor-side OOV fallback of the int-form tokenizer (q262) —
  * a standalone Serializable holder so Spark closures reference it as
  * static module state instead of capturing [[TextOps]]. */
private[graft] object BpeApply extends Serializable {

  /** One left-greedy merge pass — the Scala form of the training
    * loop's `aggregate` fold (leftmost-first; a replacement's minted
    * id immediately becomes the accumulator tail, so e.g. "aaa" under
    * (a,a) yields [X, a], exactly like the SQL fold). */
  private def mergePass(syms: Array[Int], l: Int, r: Int, mid: Int): Array[Int] = {
    val out = new Array[Int](syms.length)
    var n = 0
    var i = 0
    while (i < syms.length) {
      if (n > 0 && out(n - 1) == l && syms(i) == r) out(n - 1) = mid
      else { out(n) = syms(i); n += 1 }
      i += 1
    }
    if (n == syms.length) syms else java.util.Arrays.copyOf(out, n)
  }

  /** Apply a k-round merge table to ONE word: round t's pass maps
    * (l_t, r_t) → [[TextOps.BpeSymBase]] + t. Per-word work is
    * k · |word| with no data movement at all — the production shape of
    * a tokenizer's unknown-word path. Pinned ≡ the training fold and
    * ≡ the oracle's full re-apply chain (LlmSpec / the q262 hash
    * grade). */
  def applyMergesInt(word: String, merges: Seq[(Int, Int)]): Array[Int] = {
    var syms = new Array[Int](word.length)
    var i = 0
    while (i < word.length) { syms(i) = word.charAt(i).toInt; i += 1 }
    var t = 0
    merges.foreach { case (l, r) =>
      t += 1
      syms = mergePass(syms, l, r, TextOps.BpeSymBase + t)
    }
    syms
  }
}
