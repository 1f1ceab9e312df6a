package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LlmSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}

  test("q29 exact dedup: keepers are unique and idempotent") {
    val first = llm.TextOps.q29DedupExact(spark, sf)
    assert(first.select("keeper").distinct().count() == first.count())
    // dedup of the deduped keepers changes nothing
    val docs = Tables.documents(spark, sf)
    val keepers = docs.join(first.select(col("keeper").as("doc_id")), "doc_id")
    assert(keepers.groupBy(md5(col("text"))).count().count() == keepers.count())
  }

  test("q33 fingerprint is whitespace/case invariant") {
    import spark.implicits._
    val df = Seq(
      (1L, "Hello  World", "x", "y", 11L),
      (2L, "hello world", "x", "y", 11L),
      (3L, "HELLO\tWORLD ", "x", "y", 11L),
      (4L, "different", "x", "y", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    df.createOrReplaceTempView("tmp_docs")
    val fp = df.select(col("doc_id"),
      md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("fp"))
    val fps = fp.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) == fps(2L) && fps(2L) == fps(3L))
    assert(fps(4L) != fps(1L))
  }

  test("q36 cosine top-k: self similarity excluded, sims in [-1,1]") {
    val df = llm.Similarity.q36CosineTopk(spark, sf)
    val rows = df.collect()
    assert(rows.forall(r => r.getLong(r.fieldIndex("qid")) != r.getLong(r.fieldIndex("cid"))))
    assert(rows.forall { r =>
      val s = r.getDouble(r.fieldIndex("sim")); s >= -1.0001 && s <= 1.0001
    })
    // 10 queries x 5 neighbors
    assert(df.count() == 50)
  }

  test("q39 LSH ANN: results are a subset of same-bucket candidates with decent recall") {
    val brute = llm.Similarity.q36CosineTopk(spark, sf)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = llm.Similarity.q39AnnLsh(spark, sf)
      .select("qid", "cid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // sanity: ANN returns something and overlaps the exact answer
    assert(ann.nonEmpty)
    val recall = (ann & brute).size.toDouble / brute.size
    info(f"LSH recall vs brute force: $recall%.2f (ann=${ann.size})")
    assert(recall > 0.05, f"LSH recall $recall%.2f suspiciously low")
  }

  test("q35 langid guesses are from the closed set") {
    val langs = llm.TextOps.q35LangId(spark, sf)
      .select("guess").distinct().collect().map(_.getString(0)).toSet
    assert(langs.subsetOf(Set("de", "fr", "es", "en")))
  }

  test("q34 jaccard pairs are symmetric-safe (id1 < id2) and within [0,1]") {
    val rows = llm.TextOps.q34JaccardPairs(spark, sf).collect()
    assert(rows.forall(r => r.getLong(0) < r.getLong(1)))
    assert(rows.forall { r => val j = r.getDouble(2); j >= 0.0 && j <= 1.0 })
  }
}
