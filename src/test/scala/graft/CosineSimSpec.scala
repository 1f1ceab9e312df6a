package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CosineSim

class CosineSimSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  private def builtinCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  test("native expression is bit-identical to the builtin fold on real vectors") {
    val e = Tables.embeddings(spark, sf)
      .select($"vec_id", transform($"embedding", x => x.cast("double")).as("v"))
    val q = e.filter($"vec_id" < 5).select($"vec_id".as("qid"), $"v".as("qv"))
    val pairs = e.crossJoin(broadcast(q)).filter($"vec_id" =!= $"qid")
    val both = pairs.select(
      CosineSim.cosine(spark, $"qv", $"v").as("native"),
      builtinCosine($"qv", $"v").as("builtin"))
    val bad = both.filter($"native" =!= $"builtin").count()
    assert(bad == 0, s"$bad pairs differ between native and builtin cosine")
  }

  test("works through SQL after registration") {
    CosineSim.cosine(spark, lit(0), lit(0)) // force registration
    val r = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(1.0d, 0.0d)) AS c").head()
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    val ortho = spark.sql(
      "SELECT graft_cosine(array(1.0d, 0.0d), array(0.0d, 1.0d)) AS c").head()
    assert(math.abs(ortho.getDouble(0)) < 1e-12)
  }

  test("interpreted eval path matches codegen (literal arrays)") {
    val out = spark.range(1).select(
      CosineSim.cosine(spark,
        array(lit(3.0), lit(4.0)), array(lit(4.0), lit(3.0))).as("c")).head()
    assert(math.abs(out.getDouble(0) - 24.0 / 25.0) < 1e-12)
  }

  test("zero/empty vectors yield 0.0, never NaN or Infinity") {
    // codegen path (through a plan over real rows)
    val r = spark.range(1).select(
      CosineSim.cosine(spark,
        array(lit(0.0), lit(0.0)), array(lit(1.0), lit(2.0))).as("za"),
      CosineSim.cosine(spark,
        array(lit(0.0)), array(lit(0.0))).as("zz"),
      CosineSim.cosine(spark,
        array().cast("array<double>"), array().cast("array<double>")).as("ee")).head()
    assert(r.getDouble(0) == 0.0 && r.getDouble(1) == 0.0 && r.getDouble(2) == 0.0)
    // a zero vector must not win a similarity top-k (NaN sorts greatest)
    val sims = Seq((1L, Array(1.0, 0.0)), (2L, Array(0.0, 0.0)))
      .toDF("id", "v")
      .select($"id", CosineSim.cosine(spark, $"v", array(lit(1.0), lit(0.0))).as("sim"))
      .orderBy($"sim".desc).collect()
    assert(sims.head.getLong(0) == 1L)
  }

  test("mismatched vector dims error out instead of degrading to a prefix cosine") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    // codegen path: dims differ per-row inside a plan
    val exPlan = intercept[Throwable] {
      Seq((1L, Array(1.0, 2.0, 3.0))).toDF("id", "v")
        .select(CosineSim.cosine(spark, $"v", array(lit(1.0), lit(2.0))))
        .collect()
    }
    assert(msgs(exPlan).exists(_.contains("vector dims differ")), msgs(exPlan).mkString(" | "))
    // interpreted path: constant folding evaluates eval() driver-side
    val exFold = intercept[Throwable] {
      spark.sql("SELECT graft_cosine(array(1.0d), array(1.0d, 2.0d))").head()
    }
    assert(msgs(exFold).exists(_.contains("vector dims differ")), msgs(exFold).mkString(" | "))
  }

  test("non-double-array inputs are rejected at analysis time") {
    CosineSim.cosine(spark, lit(0), lit(0)) // force registration
    val ex = intercept[Exception] {
      spark.sql("SELECT graft_cosine(array(1, 2), array(1, 2))").head()
    }
    assert(ex.getMessage.toLowerCase.contains("array<double>"))
  }
}
