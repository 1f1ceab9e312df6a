package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  import SparkTestSession.{spark, sf}
  import spark.implicits._

  /** Reference semantics: the join+window formulation the operator
    * replaces — fanout join then keep the per-left-row winner under
    * (rt DESC, tie DESC). */
  private def windowAsOf(left: DataFrame, right: DataFrame): DataFrame = {
    val w = Window.partitionBy($"lid").orderBy($"rt".desc, $"rid".desc)
    left.join(right, $"lk" === $"rk" && $"rt" <= $"lt")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"lid", $"rid")
  }

  private def nativeAsOf(left: DataFrame, right: DataFrame): DataFrame =
    plans.AsOf.join(left, right,
        leftKeys = Seq("lk"), rightKeys = Seq("rk"),
        leftTimeCol = "lt", rightTimeCol = "rt", tieBreak = Seq("rid"))
      .select($"lid", $"rid")

  private def pairs(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("native as-of equals the window formulation on a mixed corpus") {
    val left = (0 until 500).map(i =>
      (i.toLong, (i % 13).toLong, ((i * 37) % 100).toLong)).toDF("lid", "lk", "lt")
    val right = (0 until 300).map(j =>
      ((j + 1000).toLong, (j % 17).toLong, ((j * 29) % 100).toLong)).toDF("rid", "rk", "rt")
    val expected = pairs(windowAsOf(left, right))
    val got = pairs(nativeAsOf(left, right))
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("ties at equal time resolve toward the largest tieBreak") {
    val left = Seq((1L, 7L, 50L)).toDF("lid", "lk", "lt")
    val right = Seq((10L, 7L, 50L), (11L, 7L, 50L), (9L, 7L, 49L))
      .toDF("rid", "rk", "rt")
    assert(pairs(nativeAsOf(left, right)) == Set((1L, 11L)))
  }

  test("self-join with shared column identities fails fast instead of emitting wrong data") {
    // both sides from the SAME analyzed plan share attribute exprIds;
    // the output projection would bind right columns to their left
    // twins and silently return left values — the operator must refuse
    val base = (0 until 10).map(i =>
      (i.toLong, (i % 3).toLong, i.toLong)).toDF("lid", "lk", "lt")
    val e = intercept[IllegalArgumentException] {
      plans.AsOf.join(base, base,
        leftKeys = Seq("lk"), rightKeys = Seq("lk"),
        leftTimeCol = "lt", rightTimeCol = "lt")
    }
    assert(e.getMessage.contains("share column identities"))
    // and the documented remedy — renaming one side — works
    val renamed = base.select($"lid".as("rid"), $"lk".as("rk"), $"lt".as("rt"))
    val ok = plans.AsOf.join(base, renamed,
      leftKeys = Seq("lk"), rightKeys = Seq("rk"),
      leftTimeCol = "lt", rightTimeCol = "rt", tieBreak = Seq("rid"))
    assert(ok.count() == 10)
  }

  test("null keys and times never match; unmatched left rows drop (inner semantics)") {
    val left = Seq(
      (1L, Some(7L), Some(50L)),  // matches
      (2L, None, Some(50L)),      // null key → dropped
      (3L, Some(7L), None),       // null time → dropped
      (4L, Some(8L), Some(50L))   // no right rows for key → dropped
    ).toDF("lid", "lk", "lt")
    val right = Seq(
      (10L, Some(7L), Some(40L)),
      (11L, Some(7L), None),      // null time → never a candidate
      (12L, None, Some(40L))      // null key → never a candidate
    ).toDF("rid", "rk", "rt")
    assert(pairs(nativeAsOf(left, right)) == Set((1L, 10L)))
  }

  test("strictly-later right rows never match (backward as-of)") {
    val left = Seq((1L, 7L, 50L)).toDF("lid", "lk", "lt")
    val right = Seq((10L, 7L, 51L)).toDF("rid", "rk", "rt")
    assert(pairs(nativeAsOf(left, right)).isEmpty)
  }

  test("skewed key: native matches the window formulation and avoids the fanout") {
    // one hot key carrying most of the right side — the case where the
    // join+window trick fans out left×history before discarding
    val hot = 7L
    val left = ((0 until 200).map(i => (i.toLong, hot, (i * 211 % 5000).toLong)) ++
      (200 until 260).map(i => (i.toLong, (i % 5).toLong, (i * 17 % 5000).toLong)))
      .toDF("lid", "lk", "lt")
    val right = ((0 until 50000).map(j => ((j + 100000).toLong, hot, (j % 5000).toLong)) ++
      (0 until 500).map(j => ((j + 900000).toLong, (j % 5).toLong, (j * 13 % 5000).toLong)))
      .toDF("rid", "rk", "rt")
    val t0 = System.nanoTime()
    val expected = pairs(windowAsOf(left, right))
    val tWindow = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val got = pairs(nativeAsOf(left, right))
    val tNative = (System.nanoTime() - t1) / 1e9
    info(f"skewed 50k-row key: window=$tWindow%.2fs native=$tNative%.2fs")
    assert(got == expected)
  }

  test("q21 plans through AsOfJoinExec with no fanout join") {
    val planStr = relational.Breadth.q21AsOfJoin(spark, sf)
      .queryExecution.executedPlan.toString
    assert(planStr.contains("AsOfJoin"), planStr.take(2000))
    assert(!planStr.contains("SortMergeJoin") && !planStr.contains("BroadcastHashJoin"),
      "q21 should not contain a fanout join anymore")
  }

  private def windowAsOfForward(left: DataFrame, right: DataFrame): DataFrame = {
    val w = Window.partitionBy($"lid").orderBy($"rt".asc, $"rid".asc)
    left.join(right, $"lk" === $"rk" && $"rt" >= $"lt")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"lid", $"rid")
  }

  test("forward direction equals the ascending window formulation") {
    val left = (0 until 400).map(i =>
      (i.toLong, (i % 11).toLong, ((i * 31) % 90).toLong)).toDF("lid", "lk", "lt")
    val right = (0 until 250).map(j =>
      ((j + 1000).toLong, (j % 13).toLong, ((j * 23) % 90).toLong)).toDF("rid", "rk", "rt")
    val expected = pairs(windowAsOfForward(left, right))
    val got = pairs(plans.AsOf.join(left, right, Seq("lk"), Seq("rk"),
        "lt", "rt", Seq("rid"), direction = "forward")
      .select($"lid", $"rid"))
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("forward: equal-time rows match, earlier rows never do, ties to smallest tieBreak") {
    val left = Seq((1L, 7L, 50L), (2L, 7L, 60L)).toDF("lid", "lk", "lt")
    val right = Seq((10L, 7L, 49L), (12L, 7L, 50L), (11L, 7L, 50L))
      .toDF("rid", "rk", "rt")
    val got = pairs(plans.AsOf.join(left, right, Seq("lk"), Seq("rk"),
        "lt", "rt", Seq("rid"), direction = "forward")
      .select($"lid", $"rid"))
    // lid=1 matches at rt=50, smallest rid wins; lid=2 has nothing >= 60
    assert(got == Set((1L, 11L)))
  }

  // merge_asof parity surface: left-outer row semantics + tolerance window

  private def pairsOpt(df: DataFrame): Set[(Long, Option[Long])] =
    df.collect().map(r =>
      (r.getLong(0), if (r.isNullAt(1)) None else Some(r.getLong(1)))).toSet

  test("left_outer keeps unmatched left rows — nulls in right columns (LEFT JOIN parity)") {
    val left = Seq(
      (1L, Some(7L), Some(50L)),  // matches
      (2L, None, Some(50L)),      // null key → kept with null rid
      (3L, Some(7L), None),       // null time → kept with null rid
      (4L, Some(8L), Some(50L))   // no right rows for key → kept with null rid
    ).toDF("lid", "lk", "lt")
    val right = Seq((10L, Some(7L), Some(40L))).toDF("rid", "rk", "rt")
    val got = pairsOpt(plans.AsOf.join(left, right, Seq("lk"), Seq("rk"),
        "lt", "rt", Seq("rid"), joinType = "left_outer")
      .select($"lid", $"rid"))
    assert(got == Set((1L, Some(10L)), (2L, None), (3L, None), (4L, None)))
  }

  test("left_outer equals the LEFT JOIN window formulation on a mixed corpus") {
    val left = (0 until 500).map(i =>
      (i.toLong, (i % 13).toLong, ((i * 37) % 100).toLong)).toDF("lid", "lk", "lt")
    val right = (0 until 300).map(j =>
      ((j + 1000).toLong, (j % 17).toLong, ((j * 29) % 100).toLong)).toDF("rid", "rk", "rt")
    val w = Window.partitionBy($"lid").orderBy($"rt".desc, $"rid".desc)
    val expected = pairsOpt(left
      .join(right, $"lk" === $"rk" && $"rt" <= $"lt", "left_outer")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"lid", $"rid"))
    val got = pairsOpt(plans.AsOf.join(left, right, Seq("lk"), Seq("rk"),
        "lt", "rt", Seq("rid"), joinType = "left_outer")
      .select($"lid", $"rid"))
    assert(got == expected)
    assert(got.exists(_._2.isEmpty) && got.exists(_._2.nonEmpty),
      "corpus should exercise both matched and unmatched rows")
  }

  test("tolerance bounds backward staleness; boundary is inclusive; tol=0 means exact-time") {
    val left = Seq((1L, 7L, 50L), (2L, 7L, 80L), (3L, 7L, 41L)).toDF("lid", "lk", "lt")
    val right = Seq((10L, 7L, 40L), (11L, 7L, 41L)).toDF("rid", "rk", "rt")
    def run(tol: Long, jt: String) = plans.AsOf.join(left, right,
        Seq("lk"), Seq("rk"), "lt", "rt", Seq("rid"),
        joinType = jt, tolerance = Some(tol))
      .select($"lid", $"rid")
    // tol=9: lid=1 (50-41=9, boundary) matches; lid=2 (80-41=39) too stale
    assert(pairs(run(9L, "inner")) == Set((1L, 11L), (3L, 11L)))
    // the stale row is NO match, not a fallback to an even-older row
    assert(pairsOpt(run(9L, "left_outer")) ==
      Set((1L, Some(11L)), (2L, None), (3L, Some(11L))))
    // tol=0: only the exact-time hit survives
    assert(pairs(run(0L, "inner")) == Set((3L, 11L)))
  }

  test("tolerance bounds forward distance symmetrically") {
    val left = Seq((1L, 7L, 50L), (2L, 7L, 10L)).toDF("lid", "lk", "lt")
    val right = Seq((10L, 7L, 55L), (11L, 7L, 90L)).toDF("rid", "rk", "rt")
    val got = pairsOpt(plans.AsOf.join(left, right,
        Seq("lk"), Seq("rk"), "lt", "rt", Seq("rid"),
        direction = "forward", joinType = "left_outer", tolerance = Some(5L))
      .select($"lid", $"rid"))
    // lid=1: 55-50=5 boundary match; lid=2: nearest is 45 out → null
    assert(got == Set((1L, Some(10L)), (2L, None)))
  }

  test("tolerance equals the bounded LEFT JOIN window formulation (backward, mixed corpus)") {
    val tol = 7L
    val left = (0 until 500).map(i =>
      (i.toLong, (i % 13).toLong, ((i * 37) % 100).toLong)).toDF("lid", "lk", "lt")
    val right = (0 until 300).map(j =>
      ((j + 1000).toLong, (j % 17).toLong, ((j * 29) % 100).toLong)).toDF("rid", "rk", "rt")
    val w = Window.partitionBy($"lid").orderBy($"rt".desc, $"rid".desc)
    val expected = pairsOpt(left
      .join(right,
        $"lk" === $"rk" && $"rt" <= $"lt" && $"rt" >= $"lt" - tol, "left_outer")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"lid", $"rid"))
    val got = pairsOpt(plans.AsOf.join(left, right, Seq("lk"), Seq("rk"),
        "lt", "rt", Seq("rid"), joinType = "left_outer", tolerance = Some(tol))
      .select($"lid", $"rid"))
    assert(got == expected)
  }

  test("tolerance over a non-numeric time type is rejected at the logical node") {
    val left = Seq((1L, 7L, "a")).toDF("lid", "lk", "lt")
    val right = Seq((10L, 7L, "a")).toDF("rid", "rk", "rt")
    val e = intercept[IllegalArgumentException] {
      plans.AsOf.join(left, right, Seq("lk"), Seq("rk"), "lt", "rt",
        tolerance = Some(5L))
    }
    assert(e.getMessage.contains("long-comparable"))
    val e2 = intercept[IllegalArgumentException] {
      plans.AsOf.join(left, right, Seq("lk"), Seq("rk"), "lt", "rt",
        joinType = "full_outer")
    }
    assert(e2.getMessage.contains("inner or left_outer"))
  }

  test("AQE partition coalescing keeps both shuffles zip-compatible") {
    // aggressive coalescing on asymmetric sides: if AQE chose different
    // coalesced specs per shuffle, zipPartitions would throw at runtime
    val aqeKeys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1048576")
    val saved = aqeKeys.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      aqeKeys.foreach { case (k, v) => spark.conf.set(k, v) }
      val left = (0 until 50).map(i => (i.toLong, (i % 7).toLong, i.toLong))
        .toDF("lid", "lk", "lt")
      val right = (0 until 200000).map(j =>
        ((j + 1000).toLong, (j % 7).toLong, (j % 500).toLong)).toDF("rid", "rk", "rt")
      val expected = pairs(windowAsOf(left, right))
      assert(pairs(nativeAsOf(left, right)) == expected)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("every direction × joinType × tolerance combination matches the window " +
      "formulation on duplicate-heavy timestamps under AQE coalescing") {
    // the round-7 surface's interplay audit: duplicate (key, time) rows
    // on BOTH sides (≈12 left rows and ≈8 right rows per (key, time)
    // cell), keys spanning partition boundaries, AQE coalescing active —
    // all 8 knob combinations against the generalized window reference
    def windowRef(left: DataFrame, right: DataFrame, forward: Boolean,
                  outer: Boolean, tol: Option[Long]): DataFrame = {
      val dir = if (forward) $"rt" >= $"lt" else $"rt" <= $"lt"
      val win = tol.map(t =>
        if (forward) $"rt" <= $"lt" + t else $"rt" >= $"lt" - t)
        .getOrElse(lit(true))
      val ord = if (forward) Seq($"rt".asc, $"rid".asc) else Seq($"rt".desc, $"rid".desc)
      val w = Window.partitionBy($"lid").orderBy(ord: _*)
      left.join(right, $"lk" === $"rk" && dir && win,
          if (outer) "left_outer" else "inner")
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1)
        .select($"lid", $"rid")
    }
    val aqeKeys = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1048576")
    val saved = aqeKeys.map { case (k, _) => k -> spark.conf.getOption(k) }
    try {
      aqeKeys.foreach { case (k, v) => spark.conf.set(k, v) }
      val left = (0 until 600).map(i =>
        (i.toLong, (i % 5).toLong, ((i * 7) % 10).toLong)).toDF("lid", "lk", "lt")
      val right = (0 until 400).map(j =>
        ((j + 1000).toLong, (j % 7).toLong, ((j * 3) % 10).toLong)).toDF("rid", "rk", "rt")
      for {
        forward <- Seq(false, true)
        outer <- Seq(false, true)
        tol <- Seq(None, Some(2L))
      } {
        val expected = pairsOpt(windowRef(left, right, forward, outer, tol))
        val got = pairsOpt(plans.AsOf.join(left, right,
            Seq("lk"), Seq("rk"), "lt", "rt", Seq("rid"),
            direction = if (forward) "forward" else "backward",
            joinType = if (outer) "left_outer" else "inner",
            tolerance = tol)
          .select($"lid", $"rid"))
        assert(got == expected,
          s"forward=$forward outer=$outer tol=$tol: " +
            s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
      }
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("operator preserves clustering: downstream same-key groupBy adds no exchange") {
    val left = (0 until 100).map(i => (i.toLong, (i % 7).toLong, i.toLong))
      .toDF("lid", "lk", "lt")
    val right = (0 until 100).map(j => ((j + 1000).toLong, (j % 7).toLong, (j % 50).toLong))
      .toDF("rid", "rk", "rt")
    val joinedAgg = plans.AsOf.join(left, right,
        Seq("lk"), Seq("rk"), "lt", "rt", Seq("rid"))
      .groupBy($"lk").agg(count(lit(1)).as("n"))
    val nExchanges = joinedAgg.queryExecution.executedPlan.toString
      .linesIterator.count(_.contains("Exchange"))
    // two input shuffles only — the groupBy on lk reuses the join's clustering
    assert(nExchanges == 2, s"expected 2 exchanges, got $nExchanges")
    assert(joinedAgg.count() > 0)
  }

  // ---- SQL front door: the graft_asof table function ----

  test("q126 SQL-text front door plans through AsOfJoinExec and matches the Scala path") {
    val viaSql = plans.AsOf.q126AsofSql(spark, sf)
    val planStr = viaSql.queryExecution.executedPlan.toString
    assert(planStr.contains("AsOfJoin"), planStr.take(2000))
    assert(!planStr.contains("SortMergeJoin") && !planStr.contains("BroadcastHashJoin"),
      "the TVF must reach the native exec, not a fanout join")
    val viaScala = plans.AsOf.q113AsofAttribution(spark, sf)
    assert(viaSql.collect().toSeq == viaScala.collect().toSeq)
  }

  test("graft_asof passes direction/joinType/tolerance from SQL literals to the exec") {
    val viaSql = plans.AsOf.q128AsofSqlKnobs(spark, sf)
    assert(viaSql.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val viaScala = plans.AsOf.q124AsofTolerance(spark, sf)
    assert(viaSql.collect().toSeq == viaScala.collect().toSeq)
  }

  test("graft_asof self-join via two views over ONE plan re-aliases instead of mis-binding") {
    // both views derive from the same analyzed plan, so without the
    // TVF's right-side re-alias they would share attribute exprIds —
    // the shape AsOf.join refuses because right columns would silently
    // bind to their left twins. Through the TVF the join must run AND
    // the right-side values must be genuinely the right row's.
    plans.GraftTableFunctions.register(spark)
    val base = Seq((1L, 7L, 5L), (2L, 7L, 10L)).toDF("id", "k", "t")
    base.filter($"t" >= 10).createOrReplaceTempView("graft_asof_self_l")
    base.filter($"t" < 10).createOrReplaceTempView("graft_asof_self_r")
    val rows = spark.sql(
      """SELECT * FROM graft_asof('graft_asof_self_l', 'graft_asof_self_r',
        |                         'k', 'k', 't', 't')""".stripMargin).collect()
    assert(rows.length == 1)
    val r = rows.head
    assert((r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(5)) ==
      (2L, 10L, 1L, 5L), r.toString)
  }

  test("graft_asof argument errors carry the position and the usable hint") {
    plans.GraftTableFunctions.register(spark)
    Seq((1L, 1L)).toDF("a", "b").createOrReplaceTempView("graft_asof_args_t")
    val badDir = intercept[Exception] {
      spark.sql("""SELECT * FROM graft_asof('graft_asof_args_t', 'graft_asof_args_t',
                  |  'a', 'a', 'b', 'b', '', 'sideways')""".stripMargin).collect()
    }
    assert(badDir.getMessage.contains("backward"), badDir.getMessage)
    val noView = intercept[Exception] {
      spark.sql("SELECT * FROM graft_asof('graft_no_such_view', 'graft_asof_args_t', 'a', 'a', 'b', 'b')")
        .collect()
    }
    assert(noView.getMessage.contains("graft_no_such_view"), noView.getMessage)
    val nonLiteral = intercept[Exception] {
      spark.sql("SELECT * FROM graft_asof(a, 'graft_asof_args_t', 'a', 'a', 'b', 'b')")
        .collect()
    }
    // a bare column reference as a TVF argument must surface a USER
    // error naming the column or the argument position — never Spark's
    // internal UnresolvedException invariant wording. In practice the
    // analyzer reports UNRESOLVED_COLUMN before ever invoking the
    // builder (TVF args resolve first); the builders additionally guard
    // on e.resolved so that if resolution order ever changes, the
    // fallback is our positional message, not foldable/dataType throwing
    assert(
      nonLiteral.getMessage.contains("cannot be resolved") ||
        nonLiteral.getMessage.contains("argument 1 must be a string literal"),
      nonLiteral.getMessage)
    assert(!nonLiteral.getMessage.contains("Invalid call to"),
      s"internal UnresolvedException leaked: ${nonLiteral.getMessage}")
    val badArity = intercept[Exception] {
      spark.sql("SELECT * FROM graft_asof('graft_asof_args_t')").collect()
    }
    assert(badArity.getMessage.contains("6-10") ||
      badArity.getMessage.toLowerCase.contains("argument"), badArity.getMessage)
  }

  test("q143 resample: plans through AsOfJoinExec and forward-fills correctly") {
    val df = graft.plans.AsOf.q143ResampleFfill(spark, sf)
    assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      "resample must run through the custom exec")
    val rows = df.collect()
    assert(rows.nonEmpty)
    // per user: the sampled series is a step function — each hour's value
    // equals the true last event value at or before that hour
    import org.apache.spark.sql.functions.{col, max => fmax}
    val ev = Tables.events(spark, sf).filter(col("user_id") < 20)
      .groupBy(col("user_id"), col("ts").cast("timestamp").as("ts"))
      .agg(fmax(col("value")).as("v"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getDouble(2)))
    rows.foreach { r =>
      val (u, h) = (r.getLong(0), r.getTimestamp(1).getTime)
      val expected = ev.filter(e => e._1 == u && e._2 <= h)
        .sortBy(_._2).lastOption.map(e => math.rint(e._3 * 100) / 100)
      val got = if (r.isNullAt(2)) None else Some(r.getDouble(2))
      assert(got == expected, s"user $u hour $h: got $got expected $expected")
    }
  }
}
