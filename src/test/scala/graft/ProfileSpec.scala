package graft

import graft.operators.Profile
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile reports counts, nulls, distincts, numeric bounds/mean and " +
    "string bounds; a null-only column reports null mean, not NaN") {
    val df = Seq(
      (Some(1L), Some("b"), Option.empty[Double]),
      (Some(2L), Some("a"), Option.empty[Double]),
      (Some(2L), None, Option.empty[Double]),
      (None, Some("c"), Option.empty[Double])
    ).toDF("n", "s", "z")
    val p = Profile.profile(df, Seq("n", "s", "z"), exactDistinct = true)
      .collect().map(r => r.getString(0) -> r).toMap
    val n = p("n")
    assert(n.getLong(1) === 4L && n.getLong(2) === 1L && n.getLong(3) === 2L)
    assert(n.getDouble(4) === 1.0 && n.getDouble(5) === 2.0)
    // mean = qi + rem/n reconstruction (exact integral quotient 1,
    // remainder 2): the raw IEEE value, not a 6-dp round — sum 5, n 3
    assert(n.getDouble(6) === 1.0 + 2.0 / 3.0)
    val s = p("s")
    assert(s.getLong(2) === 1L && s.getLong(3) === 3L)
    assert(s.isNullAt(4) && s.isNullAt(6))
    assert(s.getString(7) === "a" && s.getString(8) === "c")
    val z = p("z")
    assert(z.getLong(2) === 4L && z.getLong(3) === 0L)
    assert(z.isNullAt(6), "null-only numeric column must report null mean")
  }

  private def round6(d: Double): Double =
    BigDecimal(d).setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble

  test("profile mean stays exact at epoch-µs magnitudes: the decimal SUM " +
    "exceeds double precision, but qi + rem/n reconstructs the correctly " +
    "rounded mean (the raw-sum double cast is where DuckDB diverges)") {
    // true epoch-µs magnitude (~1.7e15 < 2^53): qi is double-EXACT and
    // rem/n = 0.25 sits on an ulp boundary the old raw-sum cast missed
    val vals = Seq(1705320648565608L, 1705320648565601L,
      1705320648565614L, 1705320648565610L)
    val df = vals.map(Some(_)).toDF("ts_us")
    val got = Profile.profile(df, Seq("ts_us"), exactDistinct = true)
      .head().getDouble(6)
    // independent exact expectation: BigDecimal mean, correctly rounded
    val want = (BigDecimal(vals.sum) / vals.length).toDouble
    assert(got === want)
    assert(want !== math.floor(want), "fixture must exercise a fractional mean")
  }

  test("profile mean convention on a NEGATIVE non-integral sum: qi is the " +
    "toward-zero quotient (Spark div), so the reconstruction matches the " +
    "correctly rounded mean — a floor-quotient oracle would differ by 1") {
    // sum = -50050.19 over 4 rows: div → trunc(-12512.5475) = -12512,
    // floor would give -12513; rem = -50050.19 − (−12512·4) = −2.19
    val vals = Seq(-12512.5, -12512.5, -12512.59, -12512.6)
    val df = vals.map(Some(_)).toDF("v")
    val got = Profile.profile(df, Seq("v"), exactDistinct = true)
      .head().getDouble(6)
    val want = ((BigDecimal(-12512) * 4 +
      (BigDecimal("-50050.19") - BigDecimal(-12512) * 4)) / 4).toDouble
    assert(got === want)
    // and the reconstruction is the correctly rounded true mean
    assert(got === (BigDecimal("-50050.19") / 4).toDouble)
    assert(got !== math.floor(got), "fixture must exercise a fractional mean")
  }

  test("approximate-distinct mode agrees with exact within HLL error and " +
    "matches every non-distinct statistic exactly") {
    val docs = Tables.spread(Tables.documents(spark, sf))
    val cols = Seq("doc_id", "lang", "n_chars")
    def byCol(exact: Boolean) =
      Profile.profile(docs, cols, exactDistinct = exact)
        .collect().map(r => r.getString(0) -> r).toMap
    val (ex, ap) = (byCol(true), byCol(false))
    cols.foreach { c =>
      assert(ap(c).getLong(1) === ex(c).getLong(1))
      assert(ap(c).getLong(2) === ex(c).getLong(2))
      val (e, a) = (ex(c).getLong(3).toDouble, ap(c).getLong(3).toDouble)
      assert(math.abs(a - e) / math.max(e, 1.0) < 0.1,
        s"$c: approx distinct $a vs exact $e")
    }
  }
}
