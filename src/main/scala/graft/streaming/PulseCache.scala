package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.Dataset
import graft.model.PhaseStatus

/** S17 — pulse freshness TTL (ref `commands/pulse.md:84-93`: a pulse
  * snapshot is reused iff it is younger than 60 s, else recomputed).
  * This is the reference's only materialized-view semantics: a cached
  * result with a freshness contract, not a live view.
  *
  * Implementation: the rolled-up DataFrame is persisted on first
  * compute (so reuse is a cache read, not a re-aggregation) and
  * invalidated when the TTL lapses — the stale copy is unpersisted to
  * release executor memory. The clock is injectable so the stale/fresh
  * branches are unit-testable without sleeping.
  *
  * Scale: the pulse rollup is one row per (project, plan); persisting
  * it costs O(plans), while recomputing scans O(phase-status rows) —
  * the TTL bounds how often the big scan happens no matter how many
  * dashboards poll.
  */
class TtlCache(
    ttlMs: Long = TtlCache.DefaultTtlMs,
    clock: () => Long = () => System.currentTimeMillis()) {

  private var entry: Option[(DataFrame, Long)] = None
  private var computes = 0

  /** How many times the underlying compute actually ran (metrics/tests). */
  def computeCount: Int = synchronized(computes)

  /** True iff a cached copy exists and is younger than the TTL. */
  def isFresh: Boolean = synchronized {
    entry.exists { case (_, at) => clock() - at < ttlMs }
  }

  /** The cached DataFrame if fresh, else recompute, persist, stamp. */
  def get(compute: => DataFrame): DataFrame = synchronized {
    val now = clock()
    entry match {
      case Some((df, at)) if now - at < ttlMs => df
      case stale =>
        stale.foreach { case (df, _) => df.unpersist() }
        val df = compute.persist()
        computes += 1
        entry = Some((df, now))
        df
    }
  }

  /** Drop the cached copy (e.g. after a known mutation). */
  def invalidate(): Unit = synchronized {
    entry.foreach { case (df, _) => df.unpersist() }
    entry = None
  }
}

object TtlCache {
  /** The reference's freshness window (`commands/pulse.md:84-93`). */
  val DefaultTtlMs = 60000L

  /** Convenience: a TTL-cached pulse over a status source. */
  def pulse(cache: TtlCache, statuses: => Dataset[PhaseStatus]): DataFrame =
    cache.get(Streams.pulse(statuses))
}
