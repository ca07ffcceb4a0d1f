package graft

import graft.cql.CqlEngine

/** Bulk-load mutation sink (`CqlEngine.bulkInsert`) — the distributed
  * analog of the reference's sstable bulk loader: DataFrame in, one log
  * generation out, reconciled with statement-level writes by LWW.
  */
class CqlBulkInsertSpec extends SparkSpec {

  def mkEngine: CqlEngine = new CqlEngine(spark)

  def rowsInOrder(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  test("bulk rows read back and reconcile with later statement writes") {
    import spark.implicits._
    val e = mkEngine
    e.execute("CREATE TABLE bi1 (k int, c int, v text, PRIMARY KEY (k, c))")
    e.bulkInsert("bi1", Seq((1, 1, "a"), (1, 2, "b"), (2, 1, "c")).toDF("k", "c", "v"))
    assert(rowsInOrder(e.execute("SELECT k, c, v FROM bi1")) ===
      Seq(Seq(1, 1, "a"), Seq(1, 2, "b"), Seq(2, 1, "c")))
    // a later statement-level write wins LWW over the bulk generation
    e.execute("UPDATE bi1 SET v = 'B' WHERE k = 1 AND c = 2")
    assert(rowsInOrder(e.execute("SELECT v FROM bi1 WHERE k = 1 AND c = 2")) ===
      Seq(Seq("B")))
    // absent columns stay unwritten: a second bulk load without v does not
    // shadow the existing cells (its __set flag is false)
    e.bulkInsert("bi1", Seq((1, 1), (1, 2)).toDF("k", "c"))
    assert(rowsInOrder(e.execute("SELECT v FROM bi1 WHERE k = 1")) ===
      Seq(Seq("a"), Seq("B")))
  }

  test("timestampCol assigns per-row event-time write timestamps") {
    import spark.implicits._
    val e = mkEngine
    e.execute("CREATE TABLE bi2 (k int PRIMARY KEY, v text)")
    e.bulkInsert("bi2", Seq((1, "new", 500L), (2, "old", 100L)).toDF("k", "v", "us"),
      timestampCol = Some("us"))
    assert(rowsInOrder(e.execute("SELECT k, writetime(v) FROM bi2")) ===
      Seq(Seq(1, 500L), Seq(2, 100L)))
    // a bulk row with ts below an existing cell's loses LWW
    e.bulkInsert("bi2", Seq((1, "stale", 200L)).toDF("k", "v", "us"),
      timestampCol = Some("us"))
    assert(rowsInOrder(e.execute("SELECT v FROM bi2 WHERE k = 1")) === Seq(Seq("new")))
  }

  test("bulk event-time load advances the session clock: later statements still win LWW") {
    import spark.implicits._
    val e = mkEngine
    e.execute("CREATE TABLE bi2b (k int PRIMARY KEY, v text)")
    // event-time stamps far ahead of the fresh engine's counter (~1000µs)
    e.bulkInsert("bi2b", Seq((1, "bulk", 5_000_000L)).toDF("k", "v", "us"),
      timestampCol = Some("us"))
    // a subsequent statement write must out-timestamp the loaded generation
    e.execute("UPDATE bi2b SET v = 'later' WHERE k = 1")
    assert(rowsInOrder(e.execute("SELECT v FROM bi2b")) === Seq(Seq("later")))
    // same for an explicit whole-load timestamp
    e.bulkInsert("bi2b", Seq((2, "bulk2")).toDF("k", "v"),
      timestamp = Some(9_000_000L))
    e.execute("UPDATE bi2b SET v = 'later2' WHERE k = 2")
    assert(rowsInOrder(e.execute("SELECT v FROM bi2b WHERE k = 2")) === Seq(Seq("later2")))
  }

  test("with storage attached the bulk generation lands as a parquet segment") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-bulk").toString
    val e = mkEngine
    e.attachStorage(dir)
    e.execute("CREATE TABLE bi3 (k int PRIMARY KEY, v int)")
    e.bulkInsert("bi3", (1 to 100).map(i => (i, i * 10)).toDF("k", "v"))
    val segs = new java.io.File(s"$dir/bi3/segments")
    assert(segs.isDirectory && segs.list().exists(_.endsWith(".parquet")))
    assert(e.execute("SELECT count(*) AS n FROM bi3").head().getLong(0) === 100L)
    // survives a restart from storage alone (never passed the driver tail)
    val e2 = new CqlEngine(spark)
    e2.attachStorage(dir)
    assert(e2.execute("SELECT count(*) AS n FROM bi3").head().getLong(0) === 100L)
    // validation still applies
    intercept[RuntimeException](
      e.bulkInsert("bi3", Seq(1).toDF("v")))
  }
}
