package graft

import graft.cql.CqlEngine

/** GROUP BY time-bucketing with floor(col, duration[, start]) — forward-port
  * of Cassandra 4.1 CASSANDRA-11871 (the reference snapshot predates it);
  * shapes mined from 4.1's SelectGroupByTest floor cases.
  */
class CqlFloorSpec extends SparkSpec {

  def mkEngine: CqlEngine = new CqlEngine(spark)

  def rowsInOrder(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  def assertInvalid(e: CqlEngine, cql: String, msgPart: String): Unit = {
    val ex = intercept[RuntimeException](e.execute(cql).collect())
    assert(ex.getMessage.contains(msgPart), s"got: ${ex.getMessage}")
  }

  def ts(s: String): java.sql.Timestamp =
    new java.sql.Timestamp(java.time.Instant.parse(s).toEpochMilli)

  test("GROUP BY floor(ts, 12h) buckets a timestamp clustering column") {
    val e = mkEngine
    e.execute("CREATE TABLE fl1 (k int, t timestamp, v int, PRIMARY KEY (k, t))")
    val rows = Seq(
      ("2020-01-01 01:00:00Z", 1), ("2020-01-01 05:30:00Z", 2),
      ("2020-01-01 13:00:00Z", 4), ("2020-01-01 23:59:59Z", 8),
      ("2020-01-02 00:00:00Z", 16))
    rows.foreach { case (t, v) =>
      e.execute(s"INSERT INTO fl1 (k, t, v) VALUES (1, '$t', $v)") }
    val got = rowsInOrder(e.execute(
      "SELECT k, floor(t, 12h) AS bucket, sum(v) AS s, count(*) AS n " +
        "FROM fl1 GROUP BY k, floor(t, 12h)"))
    assert(got === Seq(
      Seq(1, ts("2020-01-01T00:00:00Z"), 3, 2L),
      Seq(1, ts("2020-01-01T12:00:00Z"), 12, 2L),
      Seq(1, ts("2020-01-02T00:00:00Z"), 16, 1L)))
  }

  test("floor with a custom start shifts the bucket grid") {
    val e = mkEngine
    e.execute("CREATE TABLE fl2 (k int, t timestamp, v int, PRIMARY KEY (k, t))")
    Seq("2020-01-01 01:00:00Z", "2020-01-01 07:00:00Z").zipWithIndex.foreach {
      case (t, i) => e.execute(s"INSERT INTO fl2 (k, t, v) VALUES (1, '$t', $i)") }
    // 12h grid anchored at 06:00 → 01:00 floors to the PREVIOUS day's 18:00
    val got = rowsInOrder(e.execute(
      "SELECT floor(t, 12h, '2020-01-01 06:00:00Z') AS bucket, count(*) AS n " +
        "FROM fl2 GROUP BY k, floor(t, 12h, '2020-01-01 06:00:00Z')"))
    assert(got === Seq(
      Seq(ts("2019-12-31T18:00:00Z"), 1L),
      Seq(ts("2020-01-01T06:00:00Z"), 1L)))
  }

  test("month durations bucket on calendar months; dates floor to dates") {
    val e = mkEngine
    e.execute("CREATE TABLE fl3 (k int, t timestamp, d date, v int, PRIMARY KEY (k, t))")
    Seq(("2020-05-15 10:00:00Z", "2020-05-15"), ("2020-06-20 10:00:00Z", "2020-06-20"),
        ("2020-07-02 10:00:00Z", "2020-07-02")).zipWithIndex.foreach { case ((t, d), i) =>
      e.execute(s"INSERT INTO fl3 (k, t, d, v) VALUES (1, '$t', '$d', $i)") }
    val got = rowsInOrder(e.execute(
      "SELECT floor(t, 3mo) AS bucket, count(*) AS n FROM fl3 GROUP BY k, floor(t, 3mo)"))
    assert(got === Seq(
      Seq(ts("2020-04-01T00:00:00Z"), 2L),
      Seq(ts("2020-07-01T00:00:00Z"), 1L)))
    // scalar floor on a date column returns a date (FloorDateFunction)
    val d = rowsInOrder(e.execute("SELECT d, floor(d, 1mo) AS m FROM fl3"))
    assert(d.map(_(1).toString) === Seq("2020-05-01", "2020-06-01", "2020-07-01"))
  }

  test("scalar floor outside GROUP BY, and on time columns") {
    val e = mkEngine
    e.execute("CREATE TABLE fl4 (k int PRIMARY KEY, t timestamp, tt time)")
    e.execute("INSERT INTO fl4 (k, t, tt) VALUES (1, '2020-01-01 13:47:11Z', '13:47:11.500')")
    val r = rowsInOrder(e.execute("SELECT floor(t, 1h) AS h, floor(tt, 15m) AS q FROM fl4")).head
    assert(r(0) === ts("2020-01-01T13:00:00Z"))
    // 13:45:00 in nanos since midnight
    assert(r(1) === (13L * 3600 + 45 * 60) * 1000000000L)
  }

  test("floor durations bind through prepared statements as duration strings") {
    val e = mkEngine
    val ps = new graft.cql.PreparedStatements(e)
    e.execute("CREATE TABLE flp (k int, t timestamp, v int, PRIMARY KEY (k, t))")
    Seq("2020-01-01 01:00:00Z", "2020-01-01 13:00:00Z").zipWithIndex.foreach {
      case (t, i) => e.execute(s"INSERT INTO flp (k, t, v) VALUES (1, '$t', $i)") }
    val q = ps.prepare("SELECT floor(t, :dur) AS bucket, count(*) AS n FROM flp GROUP BY k, floor(t, :dur)")
    val got = ps.executeNamed(q.id, Map("dur" -> "12h")).collect()
      .map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    assert(got === Map(
      java.time.Instant.parse("2020-01-01T00:00:00Z").toEpochMilli -> 1L,
      java.time.Instant.parse("2020-01-01T12:00:00Z").toEpochMilli -> 1L))
  }

  test("floor validation: last-element-only, temporal-only, sane durations") {
    val e = mkEngine
    e.execute("CREATE TABLE fl5 (k int, t timestamp, c int, v int, PRIMARY KEY (k, t, c))")
    e.execute("INSERT INTO fl5 (k, t, c, v) VALUES (1, '2020-01-01 00:00:00Z', 1, 1)")
    assertInvalid(e, "SELECT count(*) FROM fl5 GROUP BY k, floor(t, 1h), c",
      "last element of the GROUP BY")
    assertInvalid(e, "SELECT count(*) FROM fl5 GROUP BY floor(k, 1h)",
      "not supported on type")
    assertInvalid(e, "SELECT floor(t, 1mo2d) FROM fl5",
      "mixing months")
    assertInvalid(e, "SELECT floor(t, 500us) FROM fl5",
      "at least 1 millisecond")
    // non-PK column can't be grouped even with floor
    assertInvalid(e, "SELECT count(*) FROM fl5 GROUP BY floor(v, 1h)",
      "only supported on the columns of the PRIMARY KEY")
  }
}
