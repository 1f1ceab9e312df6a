package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import graft.streaming.Streams.{foldTransitions, TransEvent, Transition, TransState}

/** The streaming Markov-transition operator on Spark 4's
  * `transformWithState` — the second operator on the successor stateful
  * API (the first is [[LifecycleProcessor]]): explicit typed state
  * handle, same ONE-(ts, id, type)-triple-per-user state as the
  * `flatMapGroupsWithState` form, and the SAME pure
  * [[Streams.foldTransitions]] transition function — two state APIs,
  * one operator (the `Lifecycle.step` sharing precedent).
  * StreamingSpec replays an identical feed through both forms and pins
  * equal counts, including the cross-batch chain and the out-of-order
  * drop. No timers (TimeMode.None): gap breaks are decided by event
  * times alone, so the operator needs no watermark to be correct —
  * state is bounded by the KEY SPACE (one triple per user), the same
  * contract as the fMGWS form. */
class TransitionProcessor(gapUs: Long)
    extends StatefulProcessor[Long, TransEvent, Transition] {

  @transient private var state: ValueState[TransState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    state = getHandle.getValueState[TransState](
      "last", Encoders.product[TransState], TTLConfig.NONE)
  }

  override def handleInputRows(
      key: Long,
      rows: Iterator[TransEvent],
      timerValues: TimerValues): Iterator[Transition] = {
    val (fin, out) = foldTransitions(rows.toSeq, Option(state.get()), gapUs)
    fin.foreach(state.update)
    out.iterator
  }
}

object TransitionsV2 {
  /** Same contract as [[Streams.transitionPairs]]. */
  def transitionPairs(events: Dataset[TransEvent],
      gapMinutes: Int = 30): Dataset[Transition] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new TransitionProcessor(gapMinutes * 60L * 1000000L),
        TimeMode.None(), OutputMode.Append())
  }

  /** The live transition matrix through the V2 machine. */
  def transitionCounts(events: Dataset[TransEvent],
      gapMinutes: Int = 30) = {
    import org.apache.spark.sql.functions._
    transitionPairs(events, gapMinutes)
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("n"))
  }
}
