package graft

import graft.cql.CqlEngine
import graft.functions.TimeUuid

/** Selection expression tree: scalar functions, casts and arithmetic inside
  * CQL SELECT. Cases mined from the reference validation suites
  * (`cql3/validation/operations/SelectTest.java`, `CastTest.java`,
  * `entities/TimeFcts`-adjacent tests, `OperationFcts`-shaped arithmetic).
  */
class CqlSelectExprSpec extends SparkSpec {

  def mkEngine: CqlEngine = new CqlEngine(spark)

  def first(df: org.apache.spark.sql.DataFrame): Seq[Any] =
    df.collect().head.toSeq

  test("selection arithmetic with CQL type promotion") {
    val e = mkEngine
    e.execute("CREATE TABLE ar1 (k int PRIMARY KEY, a int, b int, d double)")
    e.execute("INSERT INTO ar1 (k, a, b, d) VALUES (1, 7, 2, 1.5)")
    val r = first(e.execute(
      "SELECT a + b, a - b, a * b, a / b, a % b, -a, a + d FROM ar1"))
    assert(r === Seq(9, 5, 14, 3, 1, -7, 8.5))
    // int division truncates toward zero, and stays int-typed
    e.execute("INSERT INTO ar1 (k, a, b) VALUES (2, -7, 2)")
    assert(first(e.execute("SELECT a / b FROM ar1 WHERE k = 2")) === Seq(-3))
  }

  test("arithmetic over aggregates and aggregate of expression") {
    val e = mkEngine
    e.execute("CREATE TABLE ar2 (k int, c int, v int, PRIMARY KEY (k, c))")
    for (c <- 1 to 4) e.execute(s"INSERT INTO ar2 (k, c, v) VALUES (1, $c, ${c * 10})")
    assert(first(e.execute("SELECT max(v) - min(v) FROM ar2")) === Seq(30))
    assert(first(e.execute("SELECT sum(v + c) FROM ar2")) === Seq(110))
    assert(first(e.execute("SELECT avg(v) FROM ar2")) === Seq(25))
    // integer avg truncates toward zero, not floor (Java division)
    e.execute("CREATE TABLE ar3 (k int, c int, v int, PRIMARY KEY (k, c))")
    e.execute("INSERT INTO ar3 (k, c, v) VALUES (1, 1, -7)")
    e.execute("INSERT INTO ar3 (k, c, v) VALUES (1, 2, 0)")
    assert(first(e.execute("SELECT avg(v) FROM ar3")) === Seq(-3))
  }

  test("cast(x AS t) matrix basics (CastTest shapes)") {
    val e = mkEngine
    e.execute("CREATE TABLE c1 (k int PRIMARY KEY, i int, d double, t text)")
    e.execute("INSERT INTO c1 (k, i, d, t) VALUES (1, 3, 7.9, '42')")
    val r = first(e.execute(
      "SELECT cast(i AS double), cast(d AS int), cast(i AS text), cast(t AS int) FROM c1"))
    assert(r === Seq(3.0, 7, "3", 42))
  }

  test("cast to text renders CQL literal forms (CastAsTextFunction)") {
    val e = mkEngine
    e.execute("CREATE TABLE c2 (k int PRIMARY KEY, ts timestamp, t time, d decimal, b boolean)")
    e.execute("INSERT INTO c2 (k, ts, t, d, b) VALUES (1, '2011-02-03 04:05:00.250Z', '08:12:54.123456789', 12.3450, true)")
    val r = first(e.execute(
      "SELECT cast(ts AS text), cast(t AS text), cast(d AS text), cast(b AS text) FROM c2"))
    assert(r === Seq("2011-02-03T04:05:00.250Z", "08:12:54.123456789", "12.345", "true"))
  }

  test("todate/totimestamp/tounixtimestamp over timestamp and timeuuid") {
    val e = mkEngine
    e.execute("CREATE TABLE tf1 (k int PRIMARY KEY, ts timestamp, tu timeuuid)")
    val tu = TimeUuid.minTimeUuid(1296705900000L) // 2011-02-03 04:05:00 UTC
    e.execute(s"INSERT INTO tf1 (k, ts, tu) VALUES (1, '2011-02-03 04:05:00Z', $tu)")
    val r = first(e.execute(
      "SELECT tounixtimestamp(ts), todate(ts), tounixtimestamp(tu), totimestamp(tu) FROM tf1"))
    assert(r(0) === 1296705900000L)
    assert(r(1).toString === "2011-02-03")
    assert(r(2) === 1296705900000L)
    assert(r(3).asInstanceOf[java.sql.Timestamp].getTime === 1296705900000L)
  }

  test("now/currenttimestamp/currentdate evaluate at pinned statement time") {
    val e = mkEngine
    e.nowMicros = 1296705900000000L // 2011-02-03 04:05:00 UTC
    e.execute("CREATE TABLE nw1 (k int PRIMARY KEY, v int)")
    e.execute("INSERT INTO nw1 (k, v) VALUES (1, 1)")
    val r = first(e.execute(
      "SELECT currenttimestamp(), currentdate(), tounixtimestamp(now()) FROM nw1"))
    assert(r(0).asInstanceOf[java.sql.Timestamp].getTime === 1296705900000L)
    assert(r(1).toString === "2011-02-03")
    assert(r(2) === 1296705900000L)
  }

  test("system. function-namespace prefix resolves in terms and selection") {
    val e = mkEngine
    e.nowMicros = 1296705900000000L
    e.execute("CREATE TABLE sysfn (k int PRIMARY KEY, id timeuuid, v int)")
    e.execute("INSERT INTO sysfn (k, id, v) VALUES (1, system.now(), 5)")
    val r = first(e.execute(
      "SELECT system.tounixtimestamp(id), system.token(k), token(k) FROM sysfn"))
    assert(r(0) === 1296705900000L)
    assert(r(1) === r(2))
  }

  test("now() yields a distinct timeuuid per call, even within one millisecond") {
    val e = mkEngine
    e.nowMicros = 1296705900000000L
    e.execute("CREATE TABLE nw2 (id timeuuid PRIMARY KEY, v int)")
    // two INSERTs keyed by now() in the same pinned ms must NOT collide
    // (reference UUIDGen guarantees per-call uniqueness via the tick counter)
    e.execute("INSERT INTO nw2 (id, v) VALUES (now(), 1)")
    e.execute("INSERT INTO nw2 (id, v) VALUES (now(), 2)")
    e.execute("INSERT INTO nw2 (id, v) VALUES (now(), 3)")
    val got = e.execute("SELECT id, v FROM nw2").collect()
    assert(got.length === 3)
    assert(got.map(_.getString(0)).distinct.length === 3)
    // all three still embed the pinned millisecond
    got.foreach(r => assert(TimeUuid.unixMillisOf(r.getString(0)) === 1296705900000L))
  }

  test("mintimeuuid/maxtimeuuid boundaries filter a timeuuid clustering") {
    val e = mkEngine
    e.execute("CREATE TABLE tb1 (k int, tu timeuuid, v int, PRIMARY KEY (k, tu))")
    for (ms <- Seq(1000L, 2000L, 3000L))
      e.execute(s"INSERT INTO tb1 (k, tu, v) VALUES (1, ${TimeUuid.minTimeUuid(ms)}, ${ms / 1000})")
    // the TimeFcts boundary pattern: tu >= minTimeuuid(x) AND tu <= maxTimeuuid(y)
    val got = e.execute(
      "SELECT v FROM tb1 WHERE k = 1 AND tu >= mintimeuuid('1970-01-01 00:00:02Z') " +
        "AND tu <= maxtimeuuid('1970-01-01 00:00:02Z')")
    assert(first(got) === Seq(2))
  }

  test("blob conversion functions in selection") {
    val e = mkEngine
    e.execute("CREATE TABLE bc1 (k int PRIMARY KEY, i int)")
    e.execute("INSERT INTO bc1 (k, i) VALUES (1, 42)")
    val r = first(e.execute("SELECT blobasint(intasblob(i)) FROM bc1"))
    assert(r === Seq(42))
  }

  test("writetime and ttl still resolve through the expression tree") {
    val e = mkEngine
    e.execute("CREATE TABLE wt1 (k int PRIMARY KEY, v int)")
    e.execute("INSERT INTO wt1 (k, v) VALUES (1, 5) USING TIMESTAMP 77")
    assert(first(e.execute("SELECT writetime(v) FROM wt1")) === Seq(77L))
    assert(first(e.execute("SELECT ttl(v) FROM wt1")) === Seq(null))
  }
}
