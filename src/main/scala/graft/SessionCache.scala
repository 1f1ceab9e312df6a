package graft

import org.apache.spark.sql.SparkSession

/** Cross-query memo cache keyed by (session, dataset dir) — the shared
  * shape behind Dedup's pair cache and Stratify's strata cache.
  *
  * A bare ConcurrentHashMap keyed by SparkSession is process-lifetime:
  * a JVM that creates and stops many sessions (test suites, notebook
  * reuse) would retain every stopped session's DataFrame object graph
  * forever, because nothing ever evicts. This wrapper purges entries
  * whose underlying SparkContext has stopped on every access, so a dead
  * session's cache lines live at most until the next cache touch
  * anywhere in the JVM. (A WeakHashMap can't do this: the cached
  * DataFrame value strongly references its session key, which defeats
  * weak-key collection.)
  *
  * `onDiscard` runs on a value that lost a concurrent-build race (its
  * `putIfAbsent` was beaten) — for values holding external resources,
  * e.g. `Ckpt.pinned` DataFrames whose checkpoint blocks would
  * otherwise stay pinned for the session's lifetime, pass
  * `graft.Ckpt.free`.
  */
final class SessionCache[V >: Null](onDiscard: V => Unit = (_: V) => ()) {
  private val m =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), V]()

  private def purge(): Unit = {
    val it = m.keySet.iterator()
    while (it.hasNext) {
      if (it.next()._1.sparkContext.isStopped) it.remove()
    }
  }

  /** Memoized lookup. `build` runs outside any map lock (it may launch
    * Spark jobs, which must not serialize behind a CHM bin lock); two
    * concurrent callers may both build, but only the first `putIfAbsent`
    * is kept — the loser's value is released via `onDiscard` and the
    * winner returned, so both callers observe the SAME cached value and
    * no resource leaks. */
  def getOrElseUpdate(s: SparkSession, dir: String, build: => V): V = {
    purge()
    val k = (s, dir)
    val cur = m.get(k)
    if (cur != null) cur
    else {
      val v = build
      val prior = m.putIfAbsent(k, v)
      if (prior != null) { onDiscard(v); prior } else v
    }
  }

  private[graft] def size: Int = { purge(); m.size() }
}
