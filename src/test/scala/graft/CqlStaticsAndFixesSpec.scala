package graft

import graft.cql.CqlEngine

/** Regression goldens for the review-found semantic divergences: static-row
  * visibility and addressing (StaticColumnsTest / CQL3CasRequest), CQL LIKE's
  * literal-term matching (LikeRestriction), whole-map equality, CAS-batch
  * range deletes (CQL3CasRequest.addRangeDeletion), reversed UDA folds, and
  * DML null-key / grammar-order validation.
  */
class CqlStaticsAndFixesSpec extends SparkSpec {

  def mkEngine: CqlEngine = new CqlEngine(spark)

  def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  def rowsInOrder(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  def assertInvalid(e: CqlEngine, cql: String, msgPart: String): Unit = {
    val ex = intercept[RuntimeException](e.execute(cql).collect())
    assert(ex.getMessage.contains(msgPart), s"got: ${ex.getMessage}")
  }

  test("static insert merges into regular rows — no phantom null-clustering row (StaticColumnsTest)") {
    val e = mkEngine
    e.execute("CREATE TABLE st1 (k int, p int, s int static, v int, PRIMARY KEY (k, p))")
    e.execute("INSERT INTO st1 (k, s) VALUES (0, 42)")
    e.execute("INSERT INTO st1 (k, p, v) VALUES (0, 0, 0)")
    assert(rows(e.execute("SELECT * FROM st1")) === Set(Seq(0, 0, 42, 0)))
    // statics-only partition still surfaces as the null-clustering row
    e.execute("INSERT INTO st1 (k, s) VALUES (7, 9)")
    assert(rows(e.execute("SELECT * FROM st1 WHERE k = 7")) === Set(Seq(7, null, 9, null)))
  }

  test("bare-pk INSERT on a clustered table is rejected; WHERE pk = null is rejected") {
    val e = mkEngine
    e.execute("CREATE TABLE st2 (k int, p int, v int, PRIMARY KEY (k, p))")
    assertInvalid(e, "INSERT INTO st2 (k) VALUES (0)", "Some clustering keys are missing")
    assertInvalid(e, "UPDATE st2 SET v = 1 WHERE k = null AND p = 1",
      "Invalid null value for partition key part k")
    assertInvalid(e, "DELETE FROM st2 WHERE k = 1 AND p = null",
      "Invalid null value for clustering part p")
  }

  test("static-only single-statement CAS addresses the partition (CQL3CasRequest)") {
    val e = mkEngine
    e.execute("CREATE TABLE st3 (k int, c int, s int static, v int, PRIMARY KEY (k, c))")
    e.execute("INSERT INTO st3 (k, s) VALUES (1, 5)")
    // UPDATE ... IF on statics needs no clustering key
    assert(rowsInOrder(e.execute("UPDATE st3 SET s = 9 WHERE k = 1 IF s = 5")).head.head === true)
    assert(rows(e.execute("SELECT s FROM st3 WHERE k = 1")) === Set(Seq(9)))
    // failed static CAS reports the current values
    val failed = rowsInOrder(e.execute("UPDATE st3 SET s = 0 WHERE k = 1 IF s = 5"))
    assert(failed.head.head === false)
    // static-only INSERT IF NOT EXISTS: applies once, then not
    assert(rowsInOrder(e.execute("INSERT INTO st3 (k, s) VALUES (2, 1) IF NOT EXISTS"))
      .head.head === true)
    assert(rowsInOrder(e.execute("INSERT INTO st3 (k, s) VALUES (2, 8) IF NOT EXISTS"))
      .head.head === false)
    assert(rows(e.execute("SELECT s FROM st3 WHERE k = 2")) === Set(Seq(1)))
  }

  test("CQL LIKE matches '_' and inner '%' literally (LikeRestriction term semantics)") {
    val e = mkEngine
    e.execute("CREATE TABLE lk1 (k int PRIMARY KEY, v text)")
    e.execute("INSERT INTO lk1 (k, v) VALUES (1, 'a_cdef')")
    e.execute("INSERT INTO lk1 (k, v) VALUES (2, 'abcdef')")
    e.execute("INSERT INTO lk1 (k, v) VALUES (3, 'a%b')")
    assert(rows(e.execute("SELECT k FROM lk1 WHERE v LIKE 'a_c%' ALLOW FILTERING")) ===
      Set(Seq(1)))
    assert(rows(e.execute("SELECT k FROM lk1 WHERE v LIKE 'a%b' ALLOW FILTERING")) ===
      Set(Seq(3)))
    assert(rows(e.execute("SELECT k FROM lk1 WHERE v LIKE '%_cde%' ALLOW FILTERING")) ===
      Set(Seq(1)))
  }

  test("full() index serves whole-map equality") {
    val e = mkEngine
    e.execute("CREATE TABLE fm1 (k int PRIMARY KEY, m frozen<map<text, int>>)")
    e.execute("INSERT INTO fm1 (k, m) VALUES (1, {'a': 1, 'b': 2})")
    e.execute("INSERT INTO fm1 (k, m) VALUES (2, {'a': 1})")
    e.execute("CREATE INDEX ON fm1 (full(m))")
    assert(rows(e.execute("SELECT k FROM fm1 WHERE m = {'b': 2, 'a': 1}")) === Set(Seq(1)))
    assert(rows(e.execute("SELECT k FROM fm1 WHERE m = {'a': 1}")) === Set(Seq(2)))
  }

  test("CAS batch accepts an unconditioned range delete (CQL3CasRequest.addRangeDeletion)") {
    val e = mkEngine
    e.execute("CREATE TABLE cb1 (k int, c int, v int, PRIMARY KEY (k, c))")
    for (c <- 1 to 5) e.execute(s"INSERT INTO cb1 (k, c, v) VALUES (1, $c, $c)")
    e.execute("BEGIN BATCH " +
      "UPDATE cb1 SET v = 100 WHERE k = 1 AND c = 1 IF EXISTS; " +
      "DELETE FROM cb1 WHERE k = 1 AND c > 2; " +
      "APPLY BATCH")
    assert(rows(e.execute("SELECT c, v FROM cb1 WHERE k = 1")) ===
      Set(Seq(1, 100), Seq(2, 2)))
  }

  test("UDA folds in the reversed direction under a reversed ORDER BY read") {
    val e = mkEngine
    e.execute("CREATE TABLE ur1 (k int, c int, v text, PRIMARY KEY (k, c))")
    for ((c, v) <- Seq(1 -> "a", 2 -> "b", 3 -> "c"))
      e.execute(s"INSERT INTO ur1 (k, c, v) VALUES (1, $c, '$v')")
    e.execute("CREATE FUNCTION cat_state (st text, val text) CALLED ON NULL INPUT " +
      "RETURNS text LANGUAGE spark AS 'concat(st, val)'")
    e.execute("CREATE AGGREGATE cat_all (text) SFUNC cat_state STYPE text INITCOND ''")
    assert(rowsInOrder(e.execute(
      "SELECT k, cat_all(v) FROM ur1 WHERE k = 1 GROUP BY k")) === Seq(Seq(1, "abc")))
    assert(rowsInOrder(e.execute(
      "SELECT k, cat_all(v) FROM ur1 WHERE k = 1 GROUP BY k ORDER BY c DESC")) ===
      Seq(Seq(1, "cba")))
  }

  test("INSERT parses IF NOT EXISTS before USING (Parser.g normalInsertStatement order)") {
    val e = mkEngine
    e.execute("CREATE TABLE pi1 (k int PRIMARY KEY, v int)")
    e.execute("INSERT INTO pi1 (k, v) VALUES (1, 2) IF NOT EXISTS USING TTL 100")
    assert(rows(e.execute("SELECT v FROM pi1 WHERE k = 1")) === Set(Seq(2)))
    val ttl = e.execute("SELECT ttl(v) FROM pi1 WHERE k = 1").collect().head.get(0)
    assert(ttl != null && ttl.asInstanceOf[Int] > 0)
  }

  test("StaticColumnsTest.testStaticColumns golden flow: merge, slice, delete interactions") {
    val e = mkEngine
    e.execute("CREATE TABLE stg (k int, p int, s int static, v int, PRIMARY KEY (k, p))")
    e.execute("INSERT INTO stg (k, s) VALUES (0, 42)")
    assert(rows(e.execute("SELECT * FROM stg")) === Set(Seq(0, null, 42, null)))
    // writetime(s) is non-zero
    val wt = e.execute("SELECT s, writetime(s) FROM stg WHERE k = 0").collect().head
    assert(wt.get(0) === 42 && wt.getLong(1) > 0)
    e.execute("INSERT INTO stg (k, p, s, v) VALUES (0, 0, 12, 0)")
    e.execute("INSERT INTO stg (k, p, s, v) VALUES (0, 1, 24, 1)")
    // statics are indeed static: latest write visible on every row
    assert(rows(e.execute("SELECT * FROM stg")) === Set(Seq(0, 0, 24, 0), Seq(0, 1, 24, 1)))
    assert(rows(e.execute("SELECT * FROM stg WHERE k = 0 AND p = 0")) === Set(Seq(0, 0, 24, 0)))
    assert(rows(e.execute("SELECT * FROM stg WHERE k = 0 AND p IN (0, 1)")) ===
      Set(Seq(0, 0, 24, 0), Seq(0, 1, 24, 1)))
    assert(rows(e.execute("SELECT p, v FROM stg WHERE k = 0 AND p = 1")) === Set(Seq(1, 1)))
    // one s per row without DISTINCT
    assert(rowsInOrder(e.execute("SELECT s FROM stg WHERE k = 0")).map(_.head) === Seq(24, 24))
    assert(rows(e.execute("SELECT s, v FROM stg WHERE k = 0")) === Set(Seq(24, 0), Seq(24, 1)))
    // deleting a row does NOT implicitly delete statics
    e.execute("DELETE FROM stg WHERE k = 0 AND p = 0")
    assert(rows(e.execute("SELECT * FROM stg")) === Set(Seq(0, 1, 24, 1)))
    // explicitly deleting the static column removes it
    e.execute("DELETE s FROM stg WHERE k = 0")
    assert(rows(e.execute("SELECT * FROM stg")) === Set(Seq(0, 1, null, 1)))
  }

  test("DISTINCT over partition key + statics (StaticColumnsTest.testStaticColumnsWithDistinct)") {
    val e = mkEngine
    e.execute("CREATE TABLE std (k int, p int, s int static, PRIMARY KEY (k, p))")
    e.execute("INSERT INTO std (k, p) VALUES (1, 1)")
    e.execute("INSERT INTO std (k, p) VALUES (1, 2)")
    assert(rowsInOrder(e.execute("SELECT k, s FROM std")) === Seq(Seq(1, null), Seq(1, null)))
    assert(rows(e.execute("SELECT DISTINCT k, s FROM std")) === Set(Seq(1, null)))
    assert(rowsInOrder(e.execute("SELECT DISTINCT s FROM std WHERE k = 1")) === Seq(Seq(null)))
    assert(e.execute("SELECT DISTINCT s FROM std WHERE k = 2").count() === 0)
    e.execute("INSERT INTO std (k, p, s) VALUES (2, 1, 3)")
    e.execute("INSERT INTO std (k, p) VALUES (2, 2)")
    assert(rows(e.execute("SELECT DISTINCT k, s FROM std")) === Set(Seq(1, null), Seq(2, 3)))
    assert(rowsInOrder(e.execute("SELECT DISTINCT s FROM std WHERE k = 2")) === Seq(Seq(3)))
    // unrestricted DISTINCT on a static alone is invalid
    assertInvalid(e, "SELECT DISTINCT s FROM std", "DISTINCT")
  }

  test("statics under LIMIT ride every returned row (StaticColumnsTest.testStaticColumnsWithLimit)") {
    val e = mkEngine
    e.execute("CREATE TABLE stl (k int, s int static, v int, PRIMARY KEY (k, v))")
    e.execute("INSERT INTO stl (k, s) VALUES (0, 42)")
    for (i <- 0 until 4) e.execute(s"INSERT INTO stl (k, v) VALUES (0, $i)")
    assert(rowsInOrder(e.execute("SELECT * FROM stl WHERE k = 0 LIMIT 2")) ===
      Seq(Seq(0, 0, 42), Seq(0, 1, 42)))
    assert(rowsInOrder(e.execute("SELECT * FROM stl WHERE k = 0 LIMIT 3")) ===
      Seq(Seq(0, 0, 42), Seq(0, 1, 42), Seq(0, 2, 42)))
  }

  test("2i on a regular column returns statics on matched rows " +
    "(StaticColumnsTest.testStaticColumnsWithSecondaryIndex)") {
    val e = mkEngine
    e.execute("CREATE TABLE sti (k int, p int, s int static, v int, PRIMARY KEY (k, p))")
    e.execute("CREATE INDEX ON sti (v)")
    e.execute("INSERT INTO sti (k, p, s, v) VALUES (0, 0, 42, 1)")
    e.execute("INSERT INTO sti (k, p, v) VALUES (0, 1, 1)")
    e.execute("INSERT INTO sti (k, p, v) VALUES (0, 2, 2)")
    assert(rows(e.execute("SELECT * FROM sti WHERE v = 1")) ===
      Set(Seq(0, 0, 42, 1), Seq(0, 1, 42, 1)))
    assert(rows(e.execute("SELECT p, s FROM sti WHERE v = 1")) ===
      Set(Seq(0, 42), Seq(1, 42)))
    assert(rows(e.execute("SELECT p FROM sti WHERE v = 1")) === Set(Seq(0), Seq(1)))
  }

  test("empty-string clustering is a real row, distinct from the static marker " +
    "(StaticColumnsTest.testStaticColumnsWithEmptyClustering)") {
    val e = mkEngine
    e.execute("CREATE TABLE sec (pkey text, ckey text, value text, " +
      "static_value text static, PRIMARY KEY (pkey, ckey))")
    e.execute("INSERT INTO sec (pkey, static_value) VALUES ('partition1', 'static value')")
    e.execute("INSERT INTO sec (pkey, ckey, value) VALUES ('partition1', '', 'value')")
    assert(rows(e.execute("SELECT * FROM sec")) ===
      Set(Seq("partition1", "", "static value", "value")))
  }

  test("static columns require clustering columns (AlterTableStatement)") {
    val e = mkEngine
    e.execute("CREATE TABLE nck (bar int PRIMARY KEY)")
    assertInvalid(e, "ALTER TABLE nck ADD bar2 text static", "static")
  }

  test("prepared counter increments and decrements work (bind-marker deltas)") {
    val e = mkEngine
    e.execute("CREATE TABLE pc1 (k int PRIMARY KEY, c counter)")
    val ps = new graft.cql.PreparedStatements(e)
    val inc = ps.prepare("UPDATE pc1 SET c = c + ? WHERE k = ?").id
    val dec = ps.prepare("UPDATE pc1 SET c = c - ? WHERE k = ?").id
    ps.execute(inc, 5L, 1)
    ps.execute(inc, 2L, 1)
    ps.execute(dec, 3L, 1)
    assert(rows(e.execute("SELECT c FROM pc1 WHERE k = 1")) === Set(Seq(4L)))
  }
}
