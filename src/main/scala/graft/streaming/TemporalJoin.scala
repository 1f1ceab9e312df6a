package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming temporal (as-of) enrichment — the streaming twin of the
  * batch `plans.AsOfJoin` operator: every event is joined to its key's
  * latest update at or before the event time.
  *
  * Correctness contract: an event is emitted only once the watermark
  * has passed its timestamp — at that point no update older than the
  * event can still arrive (that is the watermark's guarantee), so the
  * match is FINAL. Out-of-order arrival on either side within the
  * watermark is handled exactly; data later than the watermark is the
  * usual streaming data-loss trade, same as every watermarked operator.
  *
  * State per key is bounded: pending events not yet passed by the
  * watermark, plus the update history pruned to the single
  * floor-update at-or-below the watermark (the only one an un-arrived
  * event could still need) and everything above it. At 100 TB-rates
  * that is O(in-flight watermark window) per key, not O(history).
  *
  * Reference analogue: the pulse/status freshness rule (S17,
  * `agents/orbiter.md:158-242`) — "answer with the latest snapshot not
  * newer than the asked-for moment".
  */
object TemporalJoin {

  /** Tagged union row: `side` is "u" (update) or "e" (event). */
  case class TIn(key: String, ts: Timestamp, side: String, data: String)

  /** Enriched event: the matched update's data/ts, None when the key
    * had no update at or before the event. */
  case class TOut(key: String, ts: Timestamp, data: String,
                  asof_data: Option[String], asof_ts: Option[Timestamp])

  /** updatesTs/eventsTs in micros inside the state for exact compares. */
  case class TState(
      updates: List[(Long, String)],      // (ts micros, data) ascending
      pending: List[(Long, String)])      // events awaiting the watermark

  /** Exact micros: getTime carries only millis; the sub-millisecond
    * part lives in getNanos (which ALSO contains the millis — hence the
    * % 1_000_000). Truncating to getTime*1000 would merge an event at
    * .000400 with an update at .000900 and enrich it with its future. */
  private[streaming] def us(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos % 1000000L) / 1000L
  private[streaming] def fromUs(u: Long): Timestamp = {
    val t = new Timestamp(u / 1000L)
    t.setNanos(((u % 1000000L) * 1000L).toInt)
    t
  }

  /** Enrich `events` (key, ts, data) with the latest row of `updates`
    * (key, ts, data) at or before each event's time. Both inputs get
    * `watermarkDelay` event-time watermarks; output rows appear once
    * the watermark passes the event (Append-mode friendly). */
  def enrich(events: DataFrame, updates: DataFrame,
             watermarkDelay: String = "10 minutes"): Dataset[TOut] = {
    val s = events.sparkSession
    import s.implicits._
    val e = events.select($"key", $"ts", $"data")
      .withWatermark("ts", watermarkDelay)
      .select($"key", $"ts", lit("e").as("side"), $"data").as[TIn]
    val u = updates.select($"key", $"ts", $"data")
      .withWatermark("ts", watermarkDelay)
      .select($"key", $"ts", lit("u").as("side"), $"data").as[TIn]
    e.union(u)
      .groupByKey(_.key)
      .flatMapGroupsWithState[TState, TOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (key, rows, state: GroupState[TState]) =>
          val st0 = state.getOption.getOrElse(TState(Nil, Nil))
          val (newU, newE) = rows.toSeq.partition(_.side == "u")
          val updatesAll =
            (st0.updates ++ newU.map(r => (us(r.ts), r.data))).sortBy(_._1)
          val pendingAll =
            (st0.pending ++ newE.map(r => (us(r.ts), r.data))).sortBy(_._1)
          // watermark is in millis; -1 when no watermark yet
          val wmUs = math.max(state.getCurrentWatermarkMs(), 0L) * 1000L
          // emit every pending event the watermark has passed: its
          // match can no longer change
          val (ripe, stillPending) = pendingAll.partition(_._1 < wmUs)
          val out = ripe.map { case (ets, edata) =>
            val m = updatesAll.takeWhile(_._1 <= ets).lastOption
            TOut(key, fromUs(ets), edata, m.map(_._2), m.map(t => fromUs(t._1)))
          }
          // prune update history: drop everything strictly below the
          // floor update at-or-below the watermark — the only row an
          // event still above the watermark could reach back to
          val floorIdx = updatesAll.lastIndexWhere(_._1 <= wmUs)
          val keptUpdates =
            if (floorIdx <= 0) updatesAll else updatesAll.drop(floorIdx)
          if (stillPending.isEmpty && keptUpdates.isEmpty) {
            state.remove()
          } else {
            state.update(TState(keptUpdates, stillPending))
            // wake when the watermark passes the next pending event even
            // if no further rows arrive for this key
            stillPending.headOption.foreach { case (ets, _) =>
              state.setTimeoutTimestamp(ets / 1000L + 1L)
            }
          }
          out.iterator
      }
  }
}
