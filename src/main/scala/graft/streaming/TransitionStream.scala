package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming next-event transition pairs with CUSTOM per-key state
  * (`flatMapGroupsWithState` + event-time timeout) — the incremental
  * form of [[graft.operators.Sessionize.transitions]]: every
  * consecutive (from, to) event pair inside a key's event-time-ordered
  * stream is emitted exactly once, at the TO event's coordinates, as
  * soon as the watermark guarantees no earlier event can still arrive.
  *
  * State per key is the last DRAINED event plus a bounded buffer of
  * events still inside the watermark horizon — O(keys + in-flight
  * window), not O(history). Events drain in (ts_us, event_id) order
  * once the watermark passes them; within-horizon disorder therefore
  * pairs correctly, which a naive last-event chain (no buffer) would
  * corrupt. An event-time timeout re-drains pending events when the
  * watermark advances without new data for the key. Downstream, the
  * pair stream aggregates to the transition-count matrix with any
  * windowed/foreachBatch sink.
  */
object TransitionStream {

  case class Ev(user_id: Long, event_id: Long, ts_us: Long, event_type: String)
  case class St(lastTs: Long, lastId: Long, lastType: String, buf: Seq[Ev])
  case class Pair(user_id: Long, from_type: String, to_type: String,
                  ts_us: Long, event_id: Long)

  /** `events` must carry `user_id`, `event_id`, an epoch-µs `ts_us`,
    * `event_type`, and the event-time timestamp column `ts_ts` for the
    * watermark (the [[MutationStream]] convention). Append mode: each
    * pair is emitted exactly once.
    */
  def pairs(events: DataFrame,
            watermarkDelay: String = "10 minutes"): Dataset[Pair] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_id"), col("ts_us"),
        col("event_type"), col("ts_ts"))
      .withWatermark("ts_ts", watermarkDelay)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  private def update(key: Long, it: Iterator[Ev],
                     state: GroupState[St]): Iterator[Pair] = {
    val st0 = state.getOption.getOrElse(St(Long.MinValue, -1L, null, Nil))
    val buf = (st0.buf ++ it).sortBy(e => (e.ts_us, e.event_id))
    // drain everything at or below the watermark: no earlier event can
    // arrive for these, so their order — and their pairs — are final
    val wmUs = state.getCurrentWatermarkMs() * 1000L
    val (ready, pending) = buf.partition(_.ts_us <= wmUs)
    var last = Option(st0.lastType).map(t => (st0.lastTs, st0.lastId, t))
    val out = ready.flatMap { e =>
      val p = last.map(l => Pair(key, l._3, e.event_type, e.ts_us, e.event_id))
      last = Some((e.ts_us, e.event_id, e.event_type))
      p
    }
    state.update(St(last.map(_._1).getOrElse(Long.MinValue),
      last.map(_._2).getOrElse(-1L), last.map(_._3).orNull, pending))
    // pending events drain when the watermark passes them even if the key
    // never sees another input — the timeout is the re-drain trigger
    if (pending.nonEmpty)
      state.setTimeoutTimestamp(pending.map(_.ts_us).min / 1000L + 1L)
    out.iterator
  }
}
