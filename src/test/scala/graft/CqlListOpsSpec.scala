package graft

import graft.cql.CqlEngine

/** List index assignment and deletion — the one read-before-write op
  * (reference `cql3/Lists.java:408-460` SetterByIndex/DiscarderByIndex;
  * cases from `operations/UpdateTest.java`, `DeleteTest.java`).
  */
class CqlListOpsSpec extends SparkSpec {

  def mkEngine: CqlEngine = new CqlEngine(spark)

  def listOf(df: org.apache.spark.sql.DataFrame): Seq[Any] =
    df.collect().head.getAs[scala.collection.Seq[Any]](0) match {
      case null => null
      case s => s.toSeq
    }

  def assertInvalid(e: CqlEngine, cql: String, msgPart: String): Unit = {
    val ex = intercept[RuntimeException](e.execute(cql).collect())
    assert(ex.getMessage.contains(msgPart), s"got: ${ex.getMessage}")
  }

  test("l[i] = x replaces the element at index i") {
    val e = mkEngine
    e.execute("CREATE TABLE lx1 (k int PRIMARY KEY, l list<text>)")
    e.execute("INSERT INTO lx1 (k, l) VALUES (1, ['a', 'b', 'c'])")
    e.execute("UPDATE lx1 SET l[1] = 'B' WHERE k = 1")
    assert(listOf(e.execute("SELECT l FROM lx1")) === Seq("a", "B", "c"))
    // composes with later appends in timestamp order
    e.execute("UPDATE lx1 SET l = l + ['d'] WHERE k = 1")
    e.execute("UPDATE lx1 SET l[3] = 'D' WHERE k = 1")
    assert(listOf(e.execute("SELECT l FROM lx1")) === Seq("a", "B", "c", "D"))
  }

  test("out-of-bound index raises the reference error") {
    val e = mkEngine
    e.execute("CREATE TABLE lx2 (k int PRIMARY KEY, l list<int>)")
    e.execute("INSERT INTO lx2 (k, l) VALUES (1, [1, 2])")
    assertInvalid(e, "UPDATE lx2 SET l[5] = 9 WHERE k = 1",
      "List index 5 out of bound, list has size 2")
    // setting an element of a null list is also invalid
    assertInvalid(e, "UPDATE lx2 SET l[0] = 9 WHERE k = 2",
      "Attempted to set an element on a list which is null")
  }

  test("DELETE l[i] and SET l[i] = null remove the element") {
    val e = mkEngine
    e.execute("CREATE TABLE lx3 (k int PRIMARY KEY, l list<int>)")
    e.execute("INSERT INTO lx3 (k, l) VALUES (1, [10, 20, 30])")
    e.execute("DELETE l[0] FROM lx3 WHERE k = 1")
    assert(listOf(e.execute("SELECT l FROM lx3")) === Seq(20, 30))
    e.execute("UPDATE lx3 SET l[1] = null WHERE k = 1")
    assert(listOf(e.execute("SELECT l FROM lx3")) === Seq(20))
  }
}
