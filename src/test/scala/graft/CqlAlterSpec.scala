package graft

import graft.cql.CqlEngine

/** ALTER TABLE ADD/DROP — schema evolution over the mutation log
  * (reference `cql3/statements/schema/AlterTableStatement.java`): existing
  * data re-projects by name, added columns read null for old rows, dropped
  * columns vanish without rewriting segments or checkpoints.
  */
class CqlAlterSpec extends SparkSpec {

  def mkEngine: CqlEngine = new CqlEngine(spark)

  def rowsInOrder(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  def assertInvalid(e: CqlEngine, cql: String, msgPart: String): Unit = {
    val ex = intercept[RuntimeException](e.execute(cql).collect())
    assert(ex.getMessage.contains(msgPart), s"got: ${ex.getMessage}")
  }

  test("ADD surfaces null for pre-existing rows; DROP hides old data") {
    val e = mkEngine
    e.execute("CREATE TABLE al1 (k int PRIMARY KEY, v int, w text)")
    e.execute("INSERT INTO al1 (k, v, w) VALUES (1, 10, 'x')")
    e.execute("ALTER TABLE al1 ADD extra double")
    assert(rowsInOrder(e.execute("SELECT k, v, w, extra FROM al1")) ===
      Seq(Seq(1, 10, "x", null)))
    e.execute("INSERT INTO al1 (k, v, extra) VALUES (2, 20, 2.5)")
    assert(rowsInOrder(e.execute("SELECT k, extra FROM al1")) ===
      Seq(Seq(1, null), Seq(2, 2.5)))
    e.execute("ALTER TABLE al1 DROP w")
    assertInvalid(e, "SELECT w FROM al1", "Undefined column name")
    assert(rowsInOrder(e.execute("SELECT k, v FROM al1")) ===
      Seq(Seq(1, 10), Seq(2, 20)))
    assertInvalid(e, "ALTER TABLE al1 DROP k", "PRIMARY KEY")
    assertInvalid(e, "ALTER TABLE al1 ADD v int", "conflicts with an existing column")
  }

  test("evolution survives flushed segments and compaction checkpoints") {
    val dir = java.nio.file.Files.createTempDirectory("graft-alter").toString
    val e = mkEngine
    e.attachStorage(dir)
    e.execute("CREATE TABLE al2 (k int PRIMARY KEY, v int)")
    e.execute("INSERT INTO al2 (k, v) VALUES (1, 1)")
    e.flush("al2")
    e.execute("INSERT INTO al2 (k, v) VALUES (2, 2)")
    e.compact("al2")
    e.execute("ALTER TABLE al2 ADD tag text")
    e.execute("INSERT INTO al2 (k, v, tag) VALUES (3, 3, 't3')")
    // checkpointed rows project into the widened schema with null tag
    assert(rowsInOrder(e.execute("SELECT k, v, tag FROM al2")) ===
      Seq(Seq(1, 1, null), Seq(2, 2, null), Seq(3, 3, "t3")))
    // updating a checkpointed row's new column reconciles per cell
    e.execute("UPDATE al2 SET tag = 't1' WHERE k = 1")
    assert(rowsInOrder(e.execute("SELECT k, tag FROM al2")) ===
      Seq(Seq(1, "t1"), Seq(2, null), Seq(3, "t3")))
  }
}
