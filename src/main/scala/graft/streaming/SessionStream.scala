package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming gap-based sessionization with CUSTOM per-key state
  * (`flatMapGroupsWithState` + event-time timeout) — the one contract the
  * native `session_window` aggregate cannot express: each emitted session
  * carries the key's 1-based session ORDINAL (`session_seq`), matching
  * the batch [[graft.operators.Sessionize]] output row-for-row, because
  * the ordinal must survive across state evictions (a window aggregate
  * forgets how many sessions a key has closed once their windows expire;
  * this operator's state carries the running count forward).
  *
  * State per key is ONE open session + the ordinal counter — O(keys),
  * not O(history). The event-time timeout closes and emits a session once
  * the watermark passes its end + gap; the state then shrinks to a
  * four-long closed-marker carrying only the counter (the ordinal
  * contract REQUIRES remembering how many sessions each key has closed —
  * fully evicting a key would restart it at seq 1; callers that accept
  * per-key restarts should use the native `session_window` instead).
  * Late events inside the watermark fold into the open session (extending
  * its bounds); events later than the watermark are the standard
  * bounded-lateness trade.
  */
object SessionStream {

  case class Ev(user_id: Long, event_id: Long, ts_us: Long)
  case class Open(seq: Long, startUs: Long, endUs: Long, n: Long)
  case class Session(user_id: Long, session_seq: Long, n_events: Long,
                     start_us: Long, end_us: Long, duration_us: Long)

  /** `events` must carry `user_id`, `event_id`, an epoch-µs `ts_us`, and
    * the event-time timestamp column `ts_ts` (the [[MutationStream]]
    * convention) for the watermark. Append mode: a session row is emitted
    * exactly once, when a newer event opens the key's next session or
    * when the watermark times the open session out.
    */
  def sessions(events: DataFrame, gapUs: Long,
               watermarkDelay: String = "10 minutes"): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_id"), col("ts_us"), col("ts_ts"))
      .withWatermark("ts_ts", watermarkDelay)
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        update(gapUs))
  }

  private def close(key: Long, o: Open): Session =
    Session(key, o.seq, o.n, o.startUs, o.endUs, o.endUs - o.startUs)

  private def update(gapUs: Long)(
      key: Long, it: Iterator[Ev], state: GroupState[Open]): Iterator[Session] = {
    if (state.hasTimedOut) {
      // emit the drained session but KEEP the ordinal counter: a state
      // with n == 0 is a closed-marker carrying only `seq`. Removing it
      // would restart the key's next session at seq 1 — the ordinal
      // contract is exactly what a watermark-evicted aggregate cannot
      // keep, and what this operator exists to keep.
      val out = state.getOption.filter(_.n > 0).map(close(key, _))
      out.foreach(_ => state.update(Open(state.get.seq, 0L, 0L, 0L)))
      out.iterator
    } else {
      // micro-batch slice for one key: sort to the batch total order —
      // bounded by the batch, never the stream
      val sorted = it.toArray.sortBy(e => (e.ts_us, e.event_id))
      val emitted = scala.collection.mutable.ArrayBuffer.empty[Session]
      var counter = state.getOption.map(_.seq).getOrElse(0L)
      var open = state.getOption.filter(_.n > 0)
      for (e <- sorted) open match {
        case Some(o) if e.ts_us - o.endUs <= gapUs =>
          open = Some(o.copy(startUs = math.min(o.startUs, e.ts_us),
            endUs = math.max(o.endUs, e.ts_us), n = o.n + 1))
        case Some(o) =>
          emitted += close(key, o)
          counter = o.seq
          open = Some(Open(o.seq + 1, e.ts_us, e.ts_us, 1))
        case None =>
          open = Some(Open(counter + 1, e.ts_us, e.ts_us, 1))
      }
      open.foreach { o =>
        state.update(o)
        // fire once the watermark passes end + gap; clamp above the
        // current watermark (an already-expired deadline is illegal)
        state.setTimeoutTimestamp(math.max(o.endUs / 1000 + gapUs / 1000 + 1,
          state.getCurrentWatermarkMs() + 1))
      }
      emitted.iterator
    }
  }
}
