package graft

import graft.cql.CqlEngine

/** CREATE MATERIALIZED VIEW semantics, mirroring `cql3/ViewTest.java`
  * basics: re-keyed projection, base updates moving view rows, deletes
  * reflected, null-PK rows excluded, validation errors.
  */
class CqlViewSpec extends SparkSpec {

  def mkEngine: CqlEngine = new CqlEngine(spark)

  def rowsInOrder(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  def assertInvalid(e: CqlEngine, cql: String, msgPart: String): Unit = {
    val ex = intercept[RuntimeException](e.execute(cql).collect())
    assert(ex.getMessage.contains(msgPart), s"got: ${ex.getMessage}")
  }

  test("re-keyed view follows base inserts, updates and deletes") {
    val e = mkEngine
    e.execute("CREATE TABLE vt1 (k int PRIMARY KEY, v int, w text)")
    e.execute("CREATE MATERIALIZED VIEW mv1 AS SELECT * FROM vt1 " +
      "WHERE v IS NOT NULL AND k IS NOT NULL PRIMARY KEY (v, k)")
    e.execute("INSERT INTO vt1 (k, v, w) VALUES (1, 10, 'a')")
    e.execute("INSERT INTO vt1 (k, v, w) VALUES (2, 20, 'b')")
    e.execute("INSERT INTO vt1 (k, w) VALUES (3, 'c')") // v null → not in view
    assert(rowsInOrder(e.execute("SELECT v, k, w FROM mv1")) ===
      Seq(Seq(10, 1, "a"), Seq(20, 2, "b")))
    // view is addressable by its own partition key
    assert(rowsInOrder(e.execute("SELECT k FROM mv1 WHERE v = 20")) === Seq(Seq(2)))
    // base update moves the view row to its new key
    e.execute("UPDATE vt1 SET v = 99 WHERE k = 1")
    assert(rowsInOrder(e.execute("SELECT v, k FROM mv1")) ===
      Seq(Seq(20, 2), Seq(99, 1)))
    // base delete removes the view row
    e.execute("DELETE FROM vt1 WHERE k = 2")
    assert(rowsInOrder(e.execute("SELECT v, k FROM mv1")) === Seq(Seq(99, 1)))
  }

  test("filtered view and explicit column selection") {
    val e = mkEngine
    e.execute("CREATE TABLE vt2 (k int, c int, score int, tag text, PRIMARY KEY (k, c))")
    for (c <- 1 to 5)
      e.execute(s"INSERT INTO vt2 (k, c, score, tag) VALUES (1, $c, ${c * 10}, 't$c')")
    e.execute("CREATE MATERIALIZED VIEW mv2 AS SELECT score FROM vt2 " +
      "WHERE k IS NOT NULL AND c IS NOT NULL AND score >= 30 PRIMARY KEY (k, c)")
    assert(rowsInOrder(e.execute("SELECT c, score FROM mv2 WHERE k = 1")) ===
      Seq(Seq(3, 30), Seq(4, 40), Seq(5, 50)))
    // tag was not selected into the view
    assertInvalid(e, "SELECT tag FROM mv2", "Undefined column name")
  }

  test("view validation and mutation guard") {
    val e = mkEngine
    e.execute("CREATE TABLE vt3 (k int PRIMARY KEY, a int, b int)")
    assertInvalid(e,
      "CREATE MATERIALIZED VIEW bad1 AS SELECT * FROM vt3 WHERE a IS NOT NULL PRIMARY KEY (a)",
      "without primary key columns from base")
    assertInvalid(e,
      "CREATE MATERIALIZED VIEW bad2 AS SELECT * FROM vt3 " +
        "WHERE k IS NOT NULL AND a IS NOT NULL AND b IS NOT NULL PRIMARY KEY (a, k, b)",
      "more than one non-primary key column")
    assertInvalid(e,
      "CREATE MATERIALIZED VIEW bad3 AS SELECT * FROM vt3 WHERE k IS NOT NULL PRIMARY KEY (a, k)",
      "IS NOT NULL")
    e.execute("CREATE MATERIALIZED VIEW mv3 AS SELECT * FROM vt3 " +
      "WHERE k IS NOT NULL AND a IS NOT NULL PRIMARY KEY (a, k)")
    assertInvalid(e, "INSERT INTO mv3 (a, k) VALUES (1, 1)", "Cannot directly modify")
    // a base table with live dependent views cannot be dropped (reference:
    // "Cannot drop table when materialized views still depend on it")
    e.execute("CREATE MATERIALIZED VIEW mv3b AS SELECT * FROM vt3 " +
      "WHERE k IS NOT NULL AND b IS NOT NULL PRIMARY KEY (b, k)")
    assertInvalid(e, "DROP TABLE vt3", "materialized views still depend")
    e.execute("DROP MATERIALIZED VIEW mv3b")
    e.execute("DROP MATERIALIZED VIEW mv3")
    assertInvalid(e, "SELECT * FROM mv3", "unconfigured table")
    e.execute("DROP TABLE vt3")
    assertInvalid(e, "SELECT * FROM vt3", "unconfigured table")
  }

  test("reversed clustering order in a view") {
    val e = mkEngine
    e.execute("CREATE TABLE vt4 (k int PRIMARY KEY, v int)")
    for (k <- 1 to 3) e.execute(s"INSERT INTO vt4 (k, v) VALUES ($k, ${4 - k})")
    e.execute("CREATE MATERIALIZED VIEW mv4 AS SELECT * FROM vt4 " +
      "WHERE v IS NOT NULL AND k IS NOT NULL PRIMARY KEY (v, k) " +
      "WITH CLUSTERING ORDER BY (k DESC)")
    assert(rowsInOrder(e.execute("SELECT v, k FROM mv4")) ===
      Seq(Seq(1, 3), Seq(2, 2), Seq(3, 1)))
  }
}
