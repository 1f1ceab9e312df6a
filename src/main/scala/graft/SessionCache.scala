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
  */
final class SessionCache[V >: Null] {
  private val m =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), V]()

  private def purge(): Unit = {
    val it = m.keySet.iterator()
    while (it.hasNext) {
      if (it.next()._1.sparkContext.isStopped) it.remove()
    }
  }

  /** Memoized lookup. `build` runs outside any map lock (it may launch
    * Spark jobs); a concurrent duplicate build is benign — last write
    * wins, both values are equivalent. */
  def getOrElseUpdate(s: SparkSession, dir: String, build: => V): V = {
    purge()
    val k = (s, dir)
    val cur = m.get(k)
    if (cur != null) cur
    else {
      val v = build
      m.put(k, v)
      v
    }
  }

  private[graft] def size: Int = { purge(); m.size() }
}
