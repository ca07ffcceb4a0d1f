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

  test("re-adding a dropped column is rejected (no cell resurrection)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-readd").toString
    val e = mkEngine
    e.attachStorage(dir)
    e.execute("CREATE TABLE ra1 (k int PRIMARY KEY, v int, w int)")
    e.execute("INSERT INTO ra1 (k, v, w) VALUES (1, 10, 20)")
    e.flush("ra1")
    e.execute("ALTER TABLE ra1 DROP w")
    assertInvalid(e, "ALTER TABLE ra1 ADD w int", "would resurrect")
    // the guard survives an engine restart (dropped set persists)
    e.flush("ra1")
    val e2 = mkEngine
    e2.attachStorage(dir)
    assertInvalid(e2, "ALTER TABLE ra1 ADD w int", "would resurrect")
    // a fresh name is fine
    e.execute("ALTER TABLE ra1 ADD w2 int")
    assert(rowsInOrder(e.execute("SELECT k, v, w2 FROM ra1")) === Seq(Seq(1, 10, null)))
  }

  test("RENAME primary key columns; regulars and durable tables rejected") {
    val e = mkEngine
    e.execute("CREATE TABLE al3 (k int, c int, v int, PRIMARY KEY (k, c))")
    e.execute("INSERT INTO al3 (k, c, v) VALUES (1, 2, 3)")
    e.execute("ALTER TABLE al3 RENAME c TO pos")
    assert(rowsInOrder(e.execute("SELECT k, pos, v FROM al3 WHERE k = 1 AND pos = 2")) ===
      Seq(Seq(1, 2, 3)))
    assertInvalid(e, "SELECT c FROM al3", "Undefined column name c")
    assertInvalid(e, "ALTER TABLE al3 RENAME v TO w", "non PRIMARY KEY")
    assertInvalid(e, "ALTER TABLE al3 RENAME k TO pos", "already exists")
    // by-name durable segments cannot alias old names
    val dir = java.nio.file.Files.createTempDirectory("graft-ren").toString
    val e2 = mkEngine
    e2.attachStorage(dir)
    e2.execute("CREATE TABLE al4 (k int, c int, PRIMARY KEY (k, c))")
    e2.execute("INSERT INTO al4 (k, c) VALUES (1, 1)")
    e2.flush("al4")
    assertInvalid(e2, "ALTER TABLE al4 RENAME c TO d", "address columns by name")
  }

  test("default_time_to_live applies to writes without explicit TTL") {
    val e = mkEngine
    e.nowMicros = 1000L * 1000000L
    e.execute("CREATE TABLE al5 (k int PRIMARY KEY, v int) WITH default_time_to_live = 60 AND comment = 'x'")
    e.execute("INSERT INTO al5 (k, v) VALUES (1, 1) USING TIMESTAMP " + (1000L * 1000000L))
    // explicit TTL overrides; TTL 0 cancels the default entirely
    e.execute("INSERT INTO al5 (k, v) VALUES (2, 2) USING TIMESTAMP " + (1000L * 1000000L) + " AND TTL 7200")
    e.execute("INSERT INTO al5 (k, v) VALUES (3, 3) USING TIMESTAMP " + (1000L * 1000000L) + " AND TTL 0")
    assert(rowsInOrder(e.execute("SELECT k, ttl(v) FROM al5")) ===
      Seq(Seq(1, 60), Seq(2, 7200), Seq(3, null)))
    // past the default TTL only the longer-lived and immortal rows survive
    e.nowMicros = 1061L * 1000000L
    assert(rowsInOrder(e.execute("SELECT k FROM al5")) === Seq(Seq(2), Seq(3)))
    // ALTER WITH changes the default for subsequent writes
    e.execute("ALTER TABLE al5 WITH default_time_to_live = 0")
    e.execute("INSERT INTO al5 (k, v) VALUES (4, 4)")
    assert(rowsInOrder(e.execute("SELECT ttl(v) FROM al5 WHERE k = 4")) === Seq(Seq(null)))
  }
}
