package graft

import graft.operators.CqlOps
import org.apache.spark.sql.functions._

class CqlOpsSpec extends SparkSpec {
  import spark.implicits._

  test("perPartitionLimit keeps first n per partition in clustering order") {
    val df = Seq((1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (2, 5, "d"))
      .toDF("pk", "ck", "v")
    val got = CqlOps.perPartitionLimit(df, Seq("pk"), Seq(col("ck").asc), 2)
      .select("pk", "ck").as[(Int, Int)].collect().toSet
    assert(got === Set((1, 1), (1, 2), (2, 5)))
  }

  test("perPartitionLimitAgg matches the window form: asc/desc directions, " +
    "null ordering, tie handling, and real data") {
    graft.functions.Functions.ensure(spark)
    val df = Seq(
      (1, Some(1), "a"), (1, Some(2), "b"), (1, Some(3), "c"),
      (2, Some(5), "d"), (2, None, "e"), (3, None, "f")
    ).toDF("pk", "ck", "v")
    def norm(d: org.apache.spark.sql.DataFrame): Set[(Int, Option[Int], String, Int)] =
      d.select("pk", "ck", "v", "rn").as[(Int, Option[Int], String, Int)].collect().toSet
    // ascending: nulls first (Spark asc default)
    assert(norm(CqlOps.perPartitionLimitAgg(df, Seq("pk"), Seq("ck" -> false), 2)) ===
      norm(CqlOps.perPartitionLimit(df, Seq("pk"), Seq(col("ck").asc), 2)))
    // descending: nulls last
    assert(norm(CqlOps.perPartitionLimitAgg(df, Seq("pk"), Seq("ck" -> true), 2)) ===
      norm(CqlOps.perPartitionLimit(df, Seq("pk"), Seq(col("ck").desc), 2)))
    // two-column clustering with mixed directions on real data
    val li = Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    def normLi(d: org.apache.spark.sql.DataFrame): Set[(Long, Long, Double, Int)] =
      d.select("l_orderkey", "l_linenumber", "l_quantity")
        .withColumn("rn", lit(0)) // rank is tie-arbitrary; compare kept row sets
        .as[(Long, Long, Double, Int)].collect().toSet
    val aggd = CqlOps.perPartitionLimitAgg(li, Seq("l_orderkey"),
      Seq("l_linenumber" -> false, "l_quantity" -> true), 3)
    val wind = CqlOps.perPartitionLimit(li, Seq("l_orderkey"),
      Seq(col("l_linenumber").asc, col("l_quantity").desc), 3)
    assert(normLi(aggd) === normLi(wind))
    // the aggregate plan partially aggregates before the exchange
    val plan = aggd.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("tokenPage pages the whole relation without overlap or loss") {
    graft.functions.Functions.ensure(spark)
    val df = (1 to 97).map(i => (i.toLong, s"v$i")).toDF("pk", "v")
    var after: Option[(Long, Seq[Any])] = None
    var seen = Vector.empty[Long]
    var pages = 0
    var done = false
    while (!done && pages < 50) {
      val page = CqlOps.tokenPage(df, Seq(col("pk")), after, 10)
        .select("pk", "_tok").collect()
      pages += 1
      if (page.isEmpty) done = true
      else {
        seen ++= page.map(_.getLong(0))
        // cursor = (token, pk) of the page's LAST row in page order
        val last = page.last
        after = Some((last.getLong(1), Seq(last.getLong(0))))
      }
    }
    // every row exactly once, in ~10 pages
    assert(seen.distinct.length === 97 && seen.length === 97)
    assert(pages >= 10 && pages <= 12)
  }

  test("lwwLatest keeps the newest version per key") {
    val df = Seq((1, 10L, "old"), (1, 20L, "new"), (2, 5L, "only"))
      .toDF("pk", "ts", "v")
    val got = CqlOps.lwwLatest(df, Seq("pk"), Seq(col("ts").desc))
      .select("pk", "v").as[(Int, String)].collect().toSet
    assert(got === Set((1, "new"), (2, "only")))
  }

  test("compactLog: delete beats older writes; ts-tie goes to the tombstone") {
    // mirror of Cells.reconcile (db/rows/Cells.java:115-160): higher ts wins;
    // equal ts → tombstone wins
    val log = Seq(
      (1, 10L, "v1", false), (1, 20L, null: String, true),          // delete wins
      (2, 10L, "v2", false), (2, 10L, null: String, true),          // tie → tombstone
      (3, 10L, null: String, true), (3, 20L, "v3", false),          // later write revives
      (4, 10L, "v4", false))
      .toDF("pk", "ts", "v", "del")
    val got = CqlOps.compactLog(log, Seq("pk"), col("ts"), Seq(col("v")), col("del"))
      .select("pk", "v").as[(Int, String)].collect().toSet
    assert(got === Set((3, "v3"), (4, "v4")))
  }

  test("compactLog is idempotent and order-insensitive (LWW merge property)") {
    for (seed <- Seq(1, 7, 42, 1234)) {
      val rnd = new scala.util.Random(seed)
      val rows = (0 until 40).map { _ =>
        (rnd.nextInt(5), rnd.nextInt(6).toLong, "v" + rnd.nextInt(100), rnd.nextInt(4) == 0)
      }
      val df = rows.toDF("pk", "ts", "v", "del")
      val shuffled = rnd.shuffle(rows).toDF("pk", "ts", "v", "del")
      def run(x: org.apache.spark.sql.DataFrame) =
        CqlOps.compactLog(x, Seq("pk"), col("ts"), Seq(col("v")), col("del"))
          .select("pk", "ts", "v").as[(Int, Long, String)].collect().toSet
      assert(run(df) === run(shuffled))
      // idempotent: compacting the compacted log is a no-op
      val once = CqlOps.compactLog(df, Seq("pk"), col("ts"), Seq(col("v")), col("del"))
      assert(run(once.withColumn("del", lit(false))) ===
        once.select("pk", "ts", "v").as[(Int, Long, String)].collect().toSet)
    }
  }

  test("tupleCompare implements lexicographic order") {
    val df = Seq((1, 1), (1, 2), (2, 1), (2, 2), (3, 1)).toDF("a", "b")
    def sel(op: String, x: Int, y: Int) =
      df.filter(CqlOps.tupleCompare(Seq(col("a"), col("b")), Seq(lit(x), lit(y)), op))
        .as[(Int, Int)].collect().toSet
    assert(sel(">", 1, 2) === Set((2, 1), (2, 2), (3, 1)))
    assert(sel(">=", 1, 2) === Set((1, 2), (2, 1), (2, 2), (3, 1)))
    assert(sel("<", 2, 2) === Set((1, 1), (1, 2), (2, 1)))
    assert(sel("<=", 2, 2) === Set((1, 1), (1, 2), (2, 1), (2, 2)))
  }

  test("withStatic attaches one per-partition value to every row") {
    val df = Seq((1, 2, "x"), (1, 1, "y"), (2, 1, "z")).toDF("pk", "ck", "v")
    val got = CqlOps.withStatic(df, Seq("pk"), Seq(col("ck").asc), col("v"), "s")
      .select("pk", "ck", "s").as[(Int, Int, String)].collect().toSet
    assert(got === Set((1, 1, "y"), (1, 2, "y"), (2, 1, "z")))
  }

  test("cassandra_token distributes orders keys across the ring") {
    val toks = Tables.orders(spark, sf)
      .select(graft.functions.Functions.cassandra_token(col("o_orderkey")).as("t"))
      .as[Long].collect()
    assert(toks.length === toks.distinct.length)
    assert(toks.exists(_ < 0) && toks.exists(_ > 0), "both ring halves populated")
  }
}
