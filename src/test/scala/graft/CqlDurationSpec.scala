package graft

import graft.cql.CqlEngine
import org.apache.spark.sql.Row

/** Duration type + temporal arithmetic and selection constructors
  * (reference `cql3/Duration.java:72-94`, `db/marshal/DurationType.java`;
  * constructor selectors `cql3/selection/ListSelector.java` et al; cases
  * from `cql3/validation/operations/SelectTest.java` and `DurationTest`-
  * adjacent suites).
  */
class CqlDurationSpec extends SparkSpec {

  def mkEngine: CqlEngine = new CqlEngine(spark)

  def first(df: org.apache.spark.sql.DataFrame): Seq[Any] =
    df.collect().head.toSeq

  def assertInvalid(e: CqlEngine, cql: String, msgPart: String): Unit = {
    val ex = intercept[RuntimeException](e.execute(cql).collect())
    assert(ex.getMessage.contains(msgPart), s"got: ${ex.getMessage}")
  }

  test("duration literal parses unit runs and round-trips as a triple") {
    val e = mkEngine
    e.execute("CREATE TABLE du1 (k int PRIMARY KEY, d duration)")
    e.execute("INSERT INTO du1 (k, d) VALUES (1, 1y2mo3d4h5m6s)")
    e.execute("INSERT INTO du1 (k, d) VALUES (2, 12h30m)")
    val got = e.execute("SELECT k, d FROM du1").collect().map(r => r.getInt(0) -> r.getStruct(1))
    assert(got(0)._2.toSeq === Seq(14, 3, (4L * 3600 + 5 * 60 + 6) * 1000000000L))
    assert(got(1)._2.toSeq === Seq(0, 0, (12L * 3600 + 30 * 60) * 1000000000L))
  }

  test("timestamp +/- duration honors calendar months") {
    val e = mkEngine
    e.execute("CREATE TABLE du2 (k int PRIMARY KEY, ts timestamp, d duration)")
    e.execute("INSERT INTO du2 (k, ts, d) VALUES (1, '2011-01-31 10:00:00Z', 1mo)")
    val r = first(e.execute("SELECT ts + 1mo, ts - 12h, ts + d FROM du2"))
    // 2011-01-31 + 1 month = 2011-02-28 (calendar-aware, not +30d)
    assert(r(0).asInstanceOf[java.sql.Timestamp].toInstant.toString === "2011-02-28T10:00:00Z")
    assert(r(1).asInstanceOf[java.sql.Timestamp].toInstant.toString === "2011-01-30T22:00:00Z")
    assert(r(2).asInstanceOf[java.sql.Timestamp].toInstant.toString === "2011-02-28T10:00:00Z")
  }

  test("durations are rejected in primary keys and set elements") {
    val e = mkEngine
    assertInvalid(e, "CREATE TABLE bad (d duration PRIMARY KEY, v int)",
      "duration type is not supported for PRIMARY KEY")
    assertInvalid(e, "CREATE TABLE bad2 (k int PRIMARY KEY, s set<duration>)",
      "not allowed as set elements")
  }

  test("collection/tuple constructors and type hints in selection") {
    val e = mkEngine
    e.execute("CREATE TABLE ct (k int PRIMARY KEY, a int, b int)")
    e.execute("INSERT INTO ct (k, a, b) VALUES (1, 7, 3)")
    val r = first(e.execute(
      "SELECT [a, b, 99], {b, a, a}, {'x': a, 'y': b}, (a, b), (double)a FROM ct"))
    assert(r(0).asInstanceOf[scala.collection.Seq[Int]].toSeq === Seq(7, 3, 99))
    assert(r(1).asInstanceOf[scala.collection.Seq[Int]].toSeq === Seq(3, 7))
    assert(r(2).asInstanceOf[Map[String, Int]] === Map("x" -> 7, "y" -> 3))
    assert(r(3).asInstanceOf[Row].toSeq === Seq(7, 3))
    assert(r(4) === 7.0)
  }
}
