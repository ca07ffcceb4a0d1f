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

  test("rangeJoin equals the naive theta-join on seeded random instances " +
    "across bucket widths (including width 1 and far-oversized)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val pts = (0 until 120).map { i =>
        (i.toLong, rnd.nextInt(5).toLong, rnd.nextInt(200).toLong - 100L)
      }
      val ivs = (0 until 40).map { i =>
        val s = rnd.nextInt(220).toLong - 110L
        (rnd.nextInt(5).toLong, s, s + rnd.nextInt(60), s"iv$i")
      }
      val ptsDf = pts.toDF("id", "k", "t")
      val ivsDf = ivs.toDF("k", "s", "e", "name")
      val naive = (for {
        (id, pk, t) <- pts
        (ik, s, e, name) <- ivs
        if ik == pk && t >= s && t <= e
      } yield (id, name)).toSet
      val width = Seq(1L, 7L, 64L, 100000L)(trial % 4)
      val got = Joins.rangeJoin(ptsDf, ivsDf, Seq("k"), "t", "s", "e",
          width, Seq("name"))
        .select("id", "iv_name").as[(Long, String)].collect().toSet
      assert(got === naive, s"trial $trial width $width")
    }
  }

  test("asofJoin equals the naive most-recent-scan on seeded random " +
    "instances, including duplicate-timestamp right rows") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 5) {
      val left = (0 until 100).map { i =>
        (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(50).toLong)
      }
      val right = (0 until 60).map { i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(50).toLong, i.toLong, s"v$i")
      }
      val naive = left.map { case (id, k, ts) =>
        val best = right.filter(r => r._1 == k && r._2 <= ts)
          .sortBy(r => (r._2, r._3)).lastOption
        (id, best.map(_._4))
      }.toMap
      val got = Joins.asofJoin(left.toDF("id", "k", "ts"),
          right.toDF("k", "sts", "rid", "v"), "k", "ts", "sts",
          Seq("v"), rightIdCol = Some("rid"))
        .select("id", "asof_v").as[(Long, Option[String])].collect().toMap
      assert(got === naive, s"trial $trial")
    }
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
  test("saltedJoin: result rows and multiplicities equal the plain inner " +
    "join on a hot-key fixture; salt 1 degenerates; dim fan-out preserved") {
    graft.functions.Functions.ensure(spark)
    import spark.implicits._
    // hot key 1L holds 500 of 520 fact rows; dim has a duplicate key (7L)
    val fact = ((1 to 500).map(i => (1L, i.toLong)) ++
      (1 to 20).map(i => ((i % 4 + 2).toLong, (1000 + i).toLong)))
      .toDF("k", "rid")
    // key 2 duplicates in dim (fan-out ×2 per fact row); key 7 is
    // dim-only, key 6 would be fact-only — inner-join membership only
    val dim = Seq((1L, "hot"), (2L, "x"), (2L, "y"), (3L, "b"), (4L, "c"),
      (5L, "d"), (7L, "never")).toDF("k", "tag")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("k", "rid", "tag").collect().map(_.toSeq)
        .groupBy(identity).view.mapValues(_.length).toMap
    val plain = canon(fact.join(dim, Seq("k")))
    assert(canon(Joins.saltedJoin(fact, dim, Seq("k"), 8, col("rid"))) === plain)
    assert(canon(Joins.saltedJoin(fact, dim, Seq("k"), 1, col("rid"))) === plain)
    // the duplicate dim key really fanned out, the dim-only key never joined
    assert(plain.keys.exists(k => k.head == 2L && k(2) == "x") &&
      plain.keys.exists(k => k.head == 2L && k(2) == "y"))
    assert(!plain.keySet.exists(_.head == 7L))
  }

  test("saltedJoin keeps fact rows whose salt expression is null (salt " +
    "changes placement, never membership)") {
    graft.functions.Functions.ensure(spark)
    val fact = Seq((1L, Some(10L)), (1L, None), (2L, None))
      .toDF("k", "rid")
    val dim = Seq((1L, "a"), (2L, "b")).toDF("k", "tag")
    val got = Joins.saltedJoin(fact, dim, Seq("k"), 8, col("rid"))
      .select("k", "tag").as[(Long, String)].collect().toSeq.sorted
    assert(got === Seq((1L, "a"), (1L, "a"), (2L, "b")))
  }

  test("asofJoin rejects a LEFT column that collides with a prefixed " +
    "attach name (duplicate output columns)") {
    val left = Seq((1L, 5L, "x")).toDF("k", "ts", "asof_state")
    val right = Seq((1L, 3L, "s")).toDF("k", "sts", "state")
    val ex = intercept[IllegalArgumentException] {
      Joins.asofJoin(left, right, "k", "ts", "sts", Seq("state"))
    }
    assert(ex.getMessage.contains("collides"))
  }

  test("rangeJoin stays exact past 2^53 (integer bucket division, no " +
    "double rounding): equals the naive theta-join at huge coordinates") {
    val base = Long.MaxValue / 4 // ~2^61, far beyond double's exact range
    val rnd = new scala.util.Random(7)
    val pts = (0 until 40).map(i => (1L, base + rnd.nextInt(60).toLong, i.toLong))
      .toDF("k", "t", "pid")
    val ivs = (0 until 12).map { i =>
      val s = base + rnd.nextInt(50).toLong
      (1L, s, s + rnd.nextInt(12).toLong, i.toLong)
    }.toDF("k", "s", "e", "iid")
    val got = Joins.rangeJoin(pts, ivs, Seq("k"), "t", "s", "e", 3L, Seq("iid"))
      .select("pid", "iv_iid").as[(Long, Long)].collect().toSet
    val naive = pts.join(ivs, Seq("k"))
      .filter(col("t") >= col("s") && col("t") <= col("e"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got === naive && naive.nonEmpty)
  }

}
