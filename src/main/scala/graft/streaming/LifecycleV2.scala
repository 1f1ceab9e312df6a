package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.model.{PhaseStatus, ToolEvent}
import graft.streaming.Lifecycle.{isTerminal, step, PhaseState, StallMinutes}

/** The lifecycle machine (S12–S15) on Spark 4's `transformWithState`
  * API — the successor to `flatMapGroupsWithState` with explicit typed
  * state handles and first-class timers. Shares the SAME pure `step`
  * transition as `Lifecycle`, so both implementations are semantically
  * one operator; LifecycleV2Spec asserts they agree.
  *
  * Timers replace the timeout-timestamp dance: one event-time timer per
  * key at `updated_at + 10 min`; progress re-registers it, a firing
  * timer emits the `stalled` record (ref `agents/orbiter.md:176-194`).
  */
class LifecycleProcessor
    extends StatefulProcessor[(String, Int, String), ToolEvent, PhaseStatus] {

  @transient private var state: ValueState[PhaseState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    state = getHandle.getValueState[PhaseState](
      "phase", Encoders.product[PhaseState], TTLConfig.NONE)
  }

  private def toStatus(key: (String, Int, String), s: PhaseState): PhaseStatus =
    PhaseStatus(s"phase-${key._2}-${key._1}", key._3, key._1, key._2, None,
      s.status, s.toolCount, s.lastTool, s.lastFile,
      s.updatedAt, s.startedAt, s.completedAt)

  override def handleInputRows(
      key: (String, Int, String),
      rows: Iterator[ToolEvent],
      timerValues: TimerValues): Iterator[PhaseStatus] = {
    // micros, not getTime millis — see Lifecycle.statusStream
    val sorted = rows.toSeq.sortBy(e => (TemporalJoin.us(e.at), e.kind))
    val init = Option(state.get())
    sorted.foldLeft(init)(step) match {
      case Some(s) =>
        state.update(s)
        if (!isTerminal(s.status) && s.status != "stalled") {
          getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
          // clamp past the watermark like Lifecycle.statusStream: a timer
          // at-or-below it would fire immediately (or be rejected),
          // stalling a key that just made progress via a late event
          getHandle.registerTimer(math.max(
            s.updatedAt.getTime + StallMinutes * 60000L,
            timerValues.getCurrentWatermarkInMs() + 1L))
        }
        Iterator.single(toStatus(key, s))
      case None => Iterator.empty
    }
  }

  override def handleExpiredTimer(
      key: (String, Int, String),
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[PhaseStatus] = {
    val s = state.get()
    if (s != null && !isTerminal(s.status)) {
      val stalled = s.copy(status = "stalled")
      state.update(stalled)
      Iterator.single(toStatus(key, stalled))
    } else Iterator.empty
  }
}

object LifecycleV2 {
  /** Streaming form on transformWithState; same contract as
    * `Lifecycle.statusStream`. */
  def statusStream(events: Dataset[ToolEvent],
      watermarkDelay: String = "10 seconds"): Dataset[PhaseStatus] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("at", watermarkDelay)
      .groupByKey(e => (e.plan_id, e.phase, e.project))
      .transformWithState(new LifecycleProcessor,
        TimeMode.EventTime(), OutputMode.Update())
  }
}
