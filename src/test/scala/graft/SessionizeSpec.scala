package graft

import graft.operators.Sessionize
import org.apache.spark.sql.functions._

class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  private val gap = 7200000000L // 2 h in µs

  test("sessions split on gaps > gap and number per-key ordinals in time order") {
    // user 1: t=0, +10s (same session), +3h (new session)
    // user 2: one event
    val df = Seq(
      (1L, 101L, 0L), (1L, 102L, 10000000L), (1L, 103L, 10810000000L),
      (2L, 201L, 5000000L))
      .toDF("user_id", "event_id", "ts_us_in")
    val got = Sessionize.sessions(df, "user_id", col("ts_us_in"), "event_id", gap)
      .orderBy("user_id", "session_seq")
      .select("user_id", "session_seq", "n_events", "start_us", "end_us", "duration_us")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (1L, 1L, 2L, 0L, 10000000L, 10000000L),
      (1L, 2L, 1L, 10810000000L, 10810000000L, 0L),
      (2L, 1L, 1L, 5000000L, 5000000L, 0L)))
  }

  test("boundary is strict: gap exactly equal to the threshold stays merged") {
    val df = Seq((1L, 1L, 0L), (1L, 2L, gap), (1L, 3L, 2 * gap + 1))
      .toDF("user_id", "event_id", "ts_us_in")
    val got = Sessionize.sessions(df, "user_id", col("ts_us_in"), "event_id", gap)
      .select("session_seq", "n_events").as[(Long, Long)].collect().toSet
    // first two merge (gap == threshold); third starts session 2 (gap+1)
    assert(got === Set((1L, 2L), (2L, 1L)))
  }

  test("equal timestamps tie-break on event_id: deterministic under repartition") {
    val ev = Tables.events(spark, sf)
    val run1 = Sessionize.sessions(ev, "user_id", Tables.tsEpochUs(ev), "event_id", gap)
      .orderBy("user_id", "session_seq").collect().toSeq
    val shuffled = ev.repartition(7)
    val run2 = Sessionize.sessions(shuffled, "user_id", Tables.tsEpochUs(shuffled),
        "event_id", gap)
      .orderBy("user_id", "session_seq").collect().toSeq
    assert(run1 === run2 && run1.nonEmpty)
  }

  test("every event lands in exactly one session; durations are non-negative") {
    val ev = Tables.events(spark, sf)
    val out = Sessionize.sessions(ev, "user_id", Tables.tsEpochUs(ev), "event_id", gap)
    val total = out.agg(sum("n_events")).as[Long].head()
    assert(total === ev.count())
    assert(out.filter(col("duration_us") < 0 ||
      col("end_us") < col("start_us")).count() === 0)
    // ordinals are 1..k dense per key
    val dense = out.groupBy("user_id")
      .agg(count(lit(1)).as("k"), min("session_seq").as("lo"), max("session_seq").as("hi"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("k")).count()
    assert(dense === 0)
  }

  test("funnel: steps count only strictly-after completions in order") {
    // u1 converts fully; u2's click precedes its first view; u3's click
    // shares the view's timestamp (strict > — no advance); u4 purchases
    // before clicking
    val df = Seq(
      (1L, "view", 10L), (1L, "click", 20L), (1L, "purchase", 30L),
      (2L, "click", 5L), (2L, "view", 10L),
      (3L, "view", 10L), (3L, "click", 10L), (3L, "purchase", 40L),
      (4L, "view", 10L), (4L, "purchase", 12L), (4L, "click", 15L))
      .toDF("user_id", "event_type", "ts_us_in")
    val got = Sessionize.funnel(df, "user_id", col("ts_us_in"), "event_type",
        Seq("view", "click", "purchase"))
      .orderBy("step")
      .as[(Int, String, Long)].collect().toSeq
    assert(got === Seq(
      (1, "view", 4L), (2, "click", 2L), (3, "purchase", 1L)))
  }

  test("retention: cohort = first active bucket, offsets count returning keys") {
    val day = 86400000000L
    // u1 active days 0,1,3; u2 active days 1,2; u3 active day 0 only;
    // duplicate events inside a day collapse
    val df = Seq(
      (1L, 0L), (1L, day + 5L), (1L, day + 9L), (1L, 3 * day),
      (2L, day), (2L, 2 * day),
      (3L, 100L))
      .toDF("user_id", "ts_us_in")
    val got = Sessionize.retention(df, "user_id", col("ts_us_in"), day)
      .orderBy("cohort", "period_offset")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      (0L, 0L, 2L), (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  test("activeUsers: rolling windows count distinct keys; trailing buckets " +
      "past the log end are not fabricated") {
    val day = 86400000000L
    // u1 active days 0 and 1 (twice on day 0); u2 active day 0 only
    val df = Seq((1L, 0L), (1L, 5L), (1L, day), (2L, 10L))
      .toDF("user_id", "ts_us_in")
    val got = Sessionize.activeUsers(df, "user_id", col("ts_us_in"), day,
        windows = Seq(1, 2))
      .orderBy("bucket", "win")
      .as[(Long, Int, Long)].collect().toSeq
    assert(got === Seq(
      (0L, 1, 2L), (0L, 2, 2L),   // day 0: both active; 2-day window same
      (1L, 1, 1L), (1L, 2, 2L)))  // day 1: only u1 daily; both in the 2-day
  }

  test("funnel: a step with zero survivors reports zero, not a missing row") {
    val df = Seq((1L, "view", 10L)).toDF("user_id", "event_type", "ts_us_in")
    val got = Sessionize.funnel(df, "user_id", col("ts_us_in"), "event_type",
        Seq("view", "click"))
      .orderBy("step").as[(Int, String, Long)].collect().toSeq
    assert(got === Seq((1, "view", 1L), (2, "click", 0L)))
  }

  test("funnel conversion window: a step completed outside maxStepGapUs " +
    "does not convert; inside it does; None keeps unbounded behavior") {
    val df = Seq(
      (1L, "view", 0L), (1L, "click", 50L),    // within the 100-window
      (2L, "view", 0L), (2L, "click", 500L),   // outside it
      (3L, "view", 0L)
    ).toDF("user_id", "event_type", "ts_us_in")
    def users(gap: Option[Long]) =
      Sessionize.funnel(df, "user_id", col("ts_us_in"), "event_type",
          Seq("view", "click"), maxStepGapUs = gap)
        .orderBy("step").as[(Int, String, Long)].collect().toSeq
    assert(users(Some(100L)) === Seq((1, "view", 3L), (2, "click", 1L)))
    assert(users(None) === Seq((1, "view", 3L), (2, "click", 2L)))
  }

  test("transitions equals the naive per-key sorted scan on seeded " +
    "random event streams (duplicate timestamps included)") {
    val rnd = new scala.util.Random(13)
    val types = Seq("a", "b", "c", "d")
    for (trial <- 1 to 3) {
      val ev = (0 until 300).map { i =>
        (rnd.nextInt(8).toLong, rnd.nextInt(40).toLong, i.toLong,
          types(rnd.nextInt(4)))
      }
      val naivePairs = ev.groupBy(_._1).values.flatMap { es =>
        es.sortBy(e => (e._2, e._3)).sliding(2).collect {
          case Seq(x, y) => (x._4, y._4)
        }
      }.toSeq
      val naiveCounts = naivePairs.groupBy(identity).map { case (p, l) => p -> l.size.toLong }
      val fromTotals = naivePairs.groupBy(_._1).map { case (f, l) => f -> l.size.toLong }
      val naive = naiveCounts.map { case ((f, t2), n) =>
        (f, t2) -> (n, BigDecimal(n.toDouble / fromTotals(f))
          .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble)
      }
      val got = Sessionize.transitions(ev.toDF("k", "ts", "id", "t"),
          "k", col("ts"), "id", "t")
        .collect().map(r => (r.getString(0), r.getString(1)) ->
          (r.getLong(2), r.getDouble(3))).toMap
      assert(got === naive, s"trial $trial")
    }
  }

  test("transitions: consecutive pairs per key in (ts, id) order, " +
    "probabilities normalize per from_type, singletons contribute nothing") {
    val ev = Seq(
      (1L, 0L, 0L, "a"), (1L, 10L, 1L, "b"), (1L, 20L, 2L, "a"), // a→b, b→a
      (2L, 0L, 3L, "a"), (2L, 10L, 4L, "b"),                     // a→b
      (3L, 0L, 5L, "c"),                                         // no pair
      (4L, 0L, 6L, "a"), (4L, 0L, 7L, "b"),                      // tie: id order
      (5L, 0L, 8L, "a"), (5L, 10L, 9L, "c")                      // a→c
    ).toDF("k", "ts", "id", "t")
    val out = Sessionize.transitions(ev, "k", col("ts"), "id", "t")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
      .toMap
    assert(out === Map(
      ("a", "b") -> (3L, 0.75), ("a", "c") -> (1L, 0.25),
      ("b", "a") -> (1L, 1.0)))
  }
}
