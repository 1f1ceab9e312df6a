package graft

import org.scalatest.funsuite.AnyFunSuite

/** The memo-pay ledger's accounting contracts (ADVICE r15 +
  * CODE-REVIEW r16): entries record NET-of-nested seconds so advisory
  * readers may sum them, and a THROWING child build must not corrupt
  * the thread-local accumulator the parent nets against. */
class SessionCacheSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("nested builds record net seconds; a throwing child leaves the parent's net intact") {
    val inner = new SessionCache[String](label = "sct_inner")
    val bad = new SessionCache[String](label = "sct_bad")
    val outer = new SessionCache[String](label = "sct_outer")
    val out = outer.getOrElseUpdate(spark, "k", {
      Thread.sleep(20) // the outer's own work (part 1)
      val a = inner.getOrElseUpdate(spark, "k", { Thread.sleep(200); "a" })
      val b =
        try bad.getOrElseUpdate(spark, "k",
          { Thread.sleep(20); throw new RuntimeException("boom") })
        catch { case _: RuntimeException => "recovered" }
      a + b
    })
    assert(out == "arecovered")
    val pays = SessionCache.paysSnapshot.filter(_._1.startsWith("sct_"))
    val byLabel = pays.map(p => p._1 -> p._3).toMap
    // the failed build recorded nothing
    assert(!byLabel.contains("sct_bad"), s"failed build must not pay: $pays")
    // the inner child recorded its own ~0.2 s
    assert(byLabel("sct_inner") >= 0.19, s"inner too small: $pays")
    // the outer's NET excludes the successful child's 0.2 s but keeps
    // its own work plus the failed attempt's seconds. Broken
    // accounting (the pre-r16 bug: the throwing child left the
    // accumulator zeroed) would record the outer at >= 0.24 s here.
    assert(byLabel("sct_outer") < 0.15,
      s"outer net must exclude the successful child's gross: $pays")
  }
}
