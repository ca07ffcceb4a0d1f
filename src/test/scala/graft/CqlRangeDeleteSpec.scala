package graft

import graft.cql.CqlEngine

/** Clustering range deletes (range tombstones) — reference
  * `cql3/statements/DeleteStatement.java` slice deletions,
  * `db/rows/RangeTombstoneMarker`; cases mined from
  * `cql3/validation/operations/DeleteTest.java`
  * (testDeleteWithRangeAndOneClusteringColumn and friends).
  */
class CqlRangeDeleteSpec extends SparkSpec {

  def mkEngine: CqlEngine = new CqlEngine(spark)

  def rowsInOrder(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  def assertInvalid(e: CqlEngine, cql: String, msgPart: String): Unit = {
    val ex = intercept[RuntimeException](e.execute(cql).collect())
    assert(ex.getMessage.contains(msgPart), s"got: ${ex.getMessage}")
  }

  test("one-sided and bounded clustering ranges with inclusivity") {
    val e = mkEngine
    e.execute("CREATE TABLE rd1 (k int, c int, v int, PRIMARY KEY (k, c))")
    for (c <- 1 to 6) e.execute(s"INSERT INTO rd1 (k, c, v) VALUES (1, $c, $c)")
    e.execute("DELETE FROM rd1 WHERE k = 1 AND c > 4")
    assert(rowsInOrder(e.execute("SELECT c FROM rd1 WHERE k = 1")) ===
      Seq(Seq(1), Seq(2), Seq(3), Seq(4)))
    e.execute("DELETE FROM rd1 WHERE k = 1 AND c >= 2 AND c < 4")
    assert(rowsInOrder(e.execute("SELECT c FROM rd1 WHERE k = 1")) ===
      Seq(Seq(1), Seq(4)))
    // rows written after the tombstone revive the range
    e.execute("INSERT INTO rd1 (k, c, v) VALUES (1, 3, 33)")
    assert(rowsInOrder(e.execute("SELECT c, v FROM rd1 WHERE k = 1")) ===
      Seq(Seq(1, 1), Seq(3, 33), Seq(4, 4)))
    // out-of-order write below the tombstone's timestamp stays dead
    e.execute("INSERT INTO rd1 (k, c, v) VALUES (1, 2, 22) USING TIMESTAMP 1")
    assert(rowsInOrder(e.execute("SELECT c FROM rd1 WHERE k = 1")) ===
      Seq(Seq(1), Seq(3), Seq(4)))
  }

  test("prefix EQ + range on the second clustering column; statics survive") {
    val e = mkEngine
    e.execute("CREATE TABLE rd2 (k int, c1 int, c2 int, s text static, v int, PRIMARY KEY (k, c1, c2))")
    e.execute("INSERT INTO rd2 (k, s) VALUES (1, 'stat')")
    for (c1 <- 1 to 2; c2 <- 1 to 3)
      e.execute(s"INSERT INTO rd2 (k, c1, c2, v) VALUES (1, $c1, $c2, ${c1 * 10 + c2})")
    e.execute("DELETE FROM rd2 WHERE k = 1 AND c1 = 1 AND c2 >= 2")
    assert(rowsInOrder(e.execute("SELECT c1, c2, v FROM rd2 WHERE k = 1 AND c1 = 1")) ===
      Seq(Seq(1, 1, 11)))
    // other prefix untouched; static cell survives the range
    assert(rowsInOrder(e.execute("SELECT c1, c2, s FROM rd2 WHERE k = 1 AND c1 = 2 AND c2 = 1")) ===
      Seq(Seq(2, 1, "stat")))
    // range on a non-following column is invalid
    assertInvalid(e, "DELETE FROM rd2 WHERE k = 1 AND c2 > 1",
      "following the EQ prefix")
    // an EQ on a clustering column AFTER the ranged one must be rejected, not
    // silently dropped (the tombstone would be unbounded in c2)
    assertInvalid(e, "DELETE FROM rd2 WHERE k = 1 AND c1 > 1 AND c2 = 3",
      "cannot be restricted")
  }

  test("multi-column tuple range deletes") {
    val e = mkEngine
    e.execute("CREATE TABLE rd4 (k int, c1 int, c2 int, v int, PRIMARY KEY (k, c1, c2))")
    for (c1 <- 1 to 3; c2 <- 1 to 3)
      e.execute(s"INSERT INTO rd4 (k, c1, c2, v) VALUES (1, $c1, $c2, ${c1 * 10 + c2})")
    e.execute("DELETE FROM rd4 WHERE k = 1 AND (c1, c2) > (2, 1)")
    assert(rowsInOrder(e.execute("SELECT c1, c2 FROM rd4 WHERE k = 1")) ===
      Seq(Seq(1, 1), Seq(1, 2), Seq(1, 3), Seq(2, 1)))
    e.execute("DELETE FROM rd4 WHERE k = 1 AND (c1, c2) <= (1, 2)")
    assert(rowsInOrder(e.execute("SELECT c1, c2 FROM rd4 WHERE k = 1")) ===
      Seq(Seq(1, 3), Seq(2, 1)))
  }

  test("IN restrictions expand DML to multi-key mutations") {
    val e = mkEngine
    e.execute("CREATE TABLE rd5 (k int, c int, v int, PRIMARY KEY (k, c))")
    for (k <- 1 to 3; c <- 1 to 2)
      e.execute(s"INSERT INTO rd5 (k, c, v) VALUES ($k, $c, ${k * 10 + c})")
    e.execute("DELETE FROM rd5 WHERE k IN (1, 3) AND c = 2")
    assert(rowsInOrder(e.execute("SELECT k, c FROM rd5")) ===
      Seq(Seq(1, 1), Seq(2, 1), Seq(2, 2), Seq(3, 1)))
    e.execute("UPDATE rd5 SET v = 0 WHERE k = 2 AND c IN (1, 2)")
    assert(rowsInOrder(e.execute("SELECT v FROM rd5 WHERE k = 2")) ===
      Seq(Seq(0), Seq(0)))
  }

  test("range tombstones survive compaction and shadow late writes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rdel").toString
    val e = mkEngine
    e.attachStorage(dir)
    e.execute("CREATE TABLE rd3 (k int, c int, v int, PRIMARY KEY (k, c))")
    for (c <- 1 to 5) e.execute(s"INSERT INTO rd3 (k, c, v) VALUES (1, $c, $c)")
    e.execute("DELETE FROM rd3 WHERE k = 1 AND c <= 2")
    val before = rowsInOrder(e.execute("SELECT c FROM rd3 WHERE k = 1"))
    assert(before === Seq(Seq(3), Seq(4), Seq(5)))
    e.compact("rd3")
    assert(rowsInOrder(e.execute("SELECT c FROM rd3 WHERE k = 1")) === before)
    // a pre-tombstone-timestamp write arriving after compaction stays dead
    e.execute("INSERT INTO rd3 (k, c, v) VALUES (1, 1, 99) USING TIMESTAMP 1")
    assert(rowsInOrder(e.execute("SELECT c FROM rd3 WHERE k = 1")) === before)
    // fresh writes into the deleted range live
    e.execute("INSERT INTO rd3 (k, c, v) VALUES (1, 2, 22)")
    assert(rowsInOrder(e.execute("SELECT c, v FROM rd3 WHERE k = 1")) ===
      Seq(Seq(2, 22), Seq(3, 3), Seq(4, 4), Seq(5, 5)))
  }
}
