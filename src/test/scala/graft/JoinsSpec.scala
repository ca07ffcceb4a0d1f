package graft

import graft.operators.Joins
import org.apache.spark.sql.functions._

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin attaches the most recent right row at or before each " +
    "left ts; earlier-than-any-state rows attach null; equal-ts states " +
    "are visible; equal-(key,ts) right rows break ties on the id") {
    val left = Seq(
      (1L, 5L, "a"),   // after state@3 → x2
      (1L, 3L, "b"),   // equal ts as state@3 → x2 (>= semantics)
      (1L, 1L, "c"),   // before any state → null
      (2L, 9L, "d")    // key 2 has no states → null
    ).toDF("k", "ts", "tag")
    val right = Seq(
      (1L, 2L, 10L, "x1"),
      (1L, 3L, 11L, "x2"),
      (1L, 3L, 12L, "x2b"), // same (k, ts): greater rid wins
      (1L, 7L, 13L, "x3")
    ).toDF("k", "sts", "rid", "state")
    val out = Joins.asofJoin(left, right, "k", "ts", "sts",
        Seq("state"), rightIdCol = Some("rid"))
      .select("tag", "asof_state").as[(String, Option[String])]
      .collect().toMap
    assert(out === Map("a" -> Some("x2b"), "b" -> Some("x2b"),
      "c" -> None, "d" -> None))
  }

  test("rangeJoin: containment inclusive at both bounds, multi-bucket " +
    "intervals match through the point's single bucket, overlapping " +
    "intervals multiply, off-key and outside points drop") {
    val pts = Seq((1L, 0L, "p0"), (1L, 10L, "p10"), (1L, 25L, "p25"),
      (2L, 10L, "q10")).toDF("k", "t", "tag")
    val ivs = Seq(
      (1L, 0L, 10L, "A"),  // two buckets at w=8; both bounds inclusive
      (1L, 5L, 30L, "B"),  // spans four buckets
      (2L, 11L, 20L, "C")  // q10 falls outside
    ).toDF("k", "s", "e", "name")
    val out = Joins.rangeJoin(pts, ivs, Seq("k"), "t", "s", "e", 8L, Seq("name"))
      .select("tag", "iv_name").as[(String, String)].collect().toSet
    assert(out === Set(("p0", "A"), ("p10", "A"), ("p10", "B"), ("p25", "B")))
  }

  test("rangeJoin buckets floor correctly on negative coordinates") {
    val pts = Seq((1L, -3L, "n")).toDF("k", "t", "tag")
    val ivs = Seq((1L, -5L, -1L, "N")).toDF("k", "s", "e", "name")
    val out = Joins.rangeJoin(pts, ivs, Seq("k"), "t", "s", "e", 4L, Seq("name"))
      .select("tag", "iv_name").as[(String, String)].collect().toSet
    assert(out === Set(("n", "N")))
  }

  test("asofJoin preserves every left row and column (left-join card)") {
    val left = Seq((1L, 10L, 1.5), (1L, 20L, 2.5)).toDF("k", "ts", "v")
    val right = Seq((1L, 15L, "s")).toDF("k", "sts", "state")
    val out = Joins.asofJoin(left, right, "k", "ts", "sts", Seq("state"))
    assert(out.columns.toSeq === Seq("k", "ts", "v", "asof_state"))
    assert(out.count() === 2)
    val byTs = out.collect().map(r => r.getLong(1) -> Option(r.getString(3))).toMap
    assert(byTs === Map(10L -> None, 20L -> Some("s")))
  }
}
