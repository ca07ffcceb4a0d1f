package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based event sessionization — the canonical clickstream/telemetry
  * operator a training-data pipeline runs over interaction logs (session
  * boundaries feed engagement features, per-session sampling, and
  * burst/abuse filtering before log text enters a corpus).
  *
  * Shape at 100 TB: ONE hash shuffle on the session key. Both window
  * passes (the lag that detects gaps and the running sum that numbers
  * sessions) and the closing per-session aggregate all share
  * `HashPartitioning(key)` — Catalyst plans a single Exchange + Sort and
  * the aggregate reuses the key partitioning (`ClusteredDistribution`'s
  * subset rule), so adding the aggregate costs no second shuffle. No
  * self-join, no driver state, no per-key memory beyond the sort spill.
  */
object Sessionize {

  /** Tag every event with its session ordinal per key: a new session
    * starts when the event-time gap from the previous event exceeds
    * `gapUs`. Total order inside a key is `(tsUs, idCol)` so replays and
    * equal-timestamp events sessionize deterministically. Output adds
    * `ts_us` (the resolved event time), `new_sess` (0/1 boundary flag)
    * and `session_seq` (1-based running count of boundaries).
    */
  def assign(events: DataFrame, keyCol: String, tsUs: Column, idCol: String,
             gapUs: Long): DataFrame = {
    val w = Window.partitionBy(keyCol).orderBy(col("ts_us").asc, col(idCol).asc)
    events
      .withColumn("ts_us", tsUs)
      // first event of a key: lag is NULL, the <= comparison is NULL → 1
      .withColumn("new_sess",
        when(col("ts_us") - lag(col("ts_us"), 1).over(w) <= gapUs, lit(0))
          .otherwise(lit(1)))
      .withColumn("session_seq",
        sum(col("new_sess"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** One row per session: event count, start/end event time (µs) and
    * duration. `session_seq` is the key's 1-based session ordinal in
    * event-time order — stable across partitioning because [[assign]]'s
    * order is total.
    */
  def sessions(events: DataFrame, keyCol: String, tsUs: Column, idCol: String,
               gapUs: Long): DataFrame =
    assign(events, keyCol, tsUs, idCol, gapUs)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .withColumn("duration_us", col("end_us") - col("start_us"))

  /** Ordered-funnel conversion (the step-sequence analytic next to
    * sessionization): one row per step with the count of keys that
    * completed steps 1..i IN ORDER — step i counts only events STRICTLY
    * after the key's earliest completion of step i-1 (an equal-timestamp
    * event does not advance the funnel, so replays can't self-convert).
    *
    * Shape at scale: per step, one type-filtered event scan aggregated
    * on the key, joined to the previous level's KEY-BOUNDED table (one
    * row per surviving key — ≤ |keys|, tiny next to the event log;
    * Spark broadcasts it once checkpointed). Each level
    * `localCheckpoint`s so the K union branches of the report read
    * materialized levels instead of recomputing the whole prefix chain
    * K times — the [[WebCuration.pageRank]] lineage pattern. The
    * per-key-sorted-fold alternative (one shuffle total) needs
    * unbounded per-key state; this form's state is one timestamp per
    * surviving key per level.
    *
    * Deterministic: every level reduces by `min` over a total order on
    * event time; counts are partitioning-independent.
    */
  def funnel(events: DataFrame, keyCol: String, tsUs: Column,
             typeCol: String, steps: Seq[String],
             maxStepGapUs: Option[Long] = None): DataFrame = {
    require(steps.nonEmpty, "funnel: need at least one step")
    require(maxStepGapUs.forall(_ > 0),
      s"funnel: maxStepGapUs must be positive, got $maxStepGapUs")
    val ev = events.select(col(keyCol).as("_k"), tsUs.as("_ts"),
      col(typeCol).as("_et"))
    var cur = ev.filter(col("_et") === steps.head)
      .groupBy("_k").agg(min(col("_ts")).as("_t"))
      .localCheckpoint()
    var levels = List(cur)
    steps.drop(1).foreach { st =>
      // conversion window: step i counts only within maxStepGapUs of the
      // key's step-(i-1) completion — the "convert within N days" form;
      // None keeps the unbounded strictly-after chain
      val within = maxStepGapUs
        .map(g => col("_ts") - col("_t") <= g).getOrElse(lit(true))
      cur = ev.filter(col("_et") === st)
        .join(cur, Seq("_k"))
        .filter(col("_ts") > col("_t") && within)
        .groupBy("_k").agg(min(col("_ts")).as("_t"))
        .localCheckpoint()
      levels ::= cur
    }
    levels.reverse.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("users"))
        .select(lit(i + 1).as("step"), lit(steps(i)).as("event_type"),
          col("users"))
    }.reduce(_ unionByName _)
  }

  /** Cohort retention: keys bucketed by their FIRST active period
    * (cohort), then counted per (cohort, period offset) — the
    * engagement-decay analytic next to [[funnel]]. Bucket index is
    * floor(tsUs / bucketUs) as a double-division spec (exact for epoch-µs
    * magnitudes: quotients sit ≥ 5e-16 relative from the nearest integer
    * unless exact, beyond double rounding's reach — and the oracle runs
    * the identical expression, so the spec can't skew).
    *
    * Shape at scale: the activity table dedupes to one row per
    * (key, bucket) — bounded by keys × periods, far under the event
    * log; the cohort table is key-bounded and joins co-partitioned on
    * the key; the final count groups on the tiny (cohort, offset) space
    * with map-side partials.
    */
  def retention(events: DataFrame, keyCol: String, tsUs: Column,
                bucketUs: Long): DataFrame = {
    require(bucketUs > 0, s"retention: bucketUs must be positive, got $bucketUs")
    val act = events
      .select(col(keyCol).as("_k"),
        floor(tsUs.cast("double") / lit(bucketUs.toDouble)).cast("long").as("_w"))
      .distinct()
    val cohorts = act.groupBy("_k").agg(min(col("_w")).as("_c"))
    act.join(cohorts, Seq("_k"))
      .groupBy(col("_c").as("cohort"), (col("_w") - col("_c")).as("period_offset"))
      .agg(count(lit(1)).as("users"))
  }

  /** Rolling active-user counts (DAU/WAU/MAU in one pass): for every
    * period bucket and every window length w, the number of distinct
    * keys active in the w buckets ENDING at that bucket. Buckets share
    * [[retention]]'s floor(tsUs/bucketUs) double-division spec.
    *
    * Shape at scale: activity dedupes to one row per (key, bucket)
    * FIRST — bounded by keys × periods, far under the event log; each
    * (key, bucket, window) then explodes to the w buckets it keeps the
    * key active in (Σw rows per activity row, windows are small
    * constants), dedupes again (a key active twice inside a window
    * counts once), and counts per (bucket, window). Output restricts to
    * buckets with actual activity, so trailing windows past the log's
    * end don't fabricate rows.
    */
  def activeUsers(events: DataFrame, keyCol: String, tsUs: Column,
                  bucketUs: Long, windows: Seq[Int]): DataFrame = {
    require(bucketUs > 0, s"activeUsers: bucketUs must be positive, got $bucketUs")
    require(windows.nonEmpty && windows.forall(_ >= 1),
      s"activeUsers: windows must be >= 1, got $windows")
    val act = events
      .select(col(keyCol).as("_k"),
        floor(tsUs.cast("double") / lit(bucketUs.toDouble)).cast("long").as("_d"))
      .distinct()
    val days = act.select(col("_d").as("b")).distinct()
    act
      .select(col("_k"), col("_d"),
        explode(array(windows.map(lit): _*)).as("win"))
      .select(col("_k"), col("win"),
        explode(sequence(col("_d"), col("_d") + col("win") - 1)).as("b"))
      .distinct()
      .join(days, "b")
      .groupBy("b", "win").agg(count(lit(1)).as("active"))
      .select(col("b").as("bucket"), col("win"), col("active"))
  }

  /** Exponentially-decayed engagement score per key: each event
    * contributes `value · 2^(−(asOf − t)/halfLife)` — the
    * recency-weighted aggregate feature stores and engagement ranking
    * use (an event `halfLife` ago counts half). `asOfUs` is
    * caller-supplied (e.g. the log's max event time) so scoring is
    * deterministic and replayable. Each term rounds to integer micros
    * and sums as longs (order-independent across partitionings — a
    * float sum would hash differently per shuffle), dividing once at
    * the end. One partial→final aggregation on the key; events at or
    * before `asOfUs` only (later events would exponentiate above 1 —
    * they belong to the next scoring run).
    */
  def decayScore(events: DataFrame, keyCol: String, tsUs: Column,
                 valueCol: Column, halfLifeUs: Long,
                 asOfUs: Long): DataFrame = {
    require(halfLifeUs > 0, s"decayScore: halfLifeUs must be positive, got $halfLifeUs")
    val dt = (lit(asOfUs) - tsUs).cast("double")
    val term = round(valueCol.cast("double") *
      pow(lit(2.0), -dt / lit(halfLifeUs.toDouble)) * lit(1e6)).cast("long")
    events.filter(tsUs <= asOfUs)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_events"),
        round(sum(term).cast("double") / 1e6, 6).as("decay_score"))
  }

  /** Next-event transition matrix (first-order Markov step analytics):
    * one row per observed consecutive (from_type, to_type) pair inside a
    * key's event-time-ordered stream, with the pair count and the
    * per-from transition probability (count / all transitions out of
    * from_type, rounded to 6 dp).
    *
    * Shape at scale: ONE hash shuffle on the key for the lead window
    * (only key/ts/id/type project into it — no payload), then the pair
    * aggregation reduces onto the |types|² key space (partial map-side),
    * and the probability normalization windows over that tiny aggregate,
    * never the event log. Deterministic: total order `(tsUs, idCol)`
    * inside each key, so equal-timestamp events pair identically across
    * partitionings.
    */
  def transitions(events: DataFrame, keyCol: String, tsUs: Column,
                  idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy("_k").orderBy(col("_ts").asc, col(idCol).asc)
    val pairs = events
      .select(col(keyCol).as("_k"), tsUs.as("_ts"), col(idCol),
        col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
    pairs.groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n") /
        sum(col("n")).over(Window.partitionBy("from_type")), 6))
  }
}
