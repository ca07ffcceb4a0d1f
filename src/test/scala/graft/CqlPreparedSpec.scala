package graft

import graft.cql.{CqlEngine, PreparedStatements}

/** Named bind markers and the bounded auto-flushing mutation tail. */
class CqlPreparedSpec extends SparkSpec {

  def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("named markers :name bind by name; repeats bind once") {
    val e = new CqlEngine(spark)
    val ps = new PreparedStatements(e)
    e.execute("CREATE TABLE np1 (k int, c int, v int, PRIMARY KEY (k, c))")
    val ins = ps.prepare("INSERT INTO np1 (k, c, v) VALUES (:key, :c, :val)")
    assert(ins.numBinds === 3)
    ps.executeNamed(ins.id, Map("key" -> 1, "c" -> 2, "val" -> 20))
    ps.executeNamed(ins.id, Map("key" -> 1, "c" -> 3, "val" -> 30))
    // a repeated :name occupies one bind slot
    val sel = ps.prepare("SELECT v FROM np1 WHERE k = :x AND c >= :x ALLOW FILTERING")
    assert(sel.numBinds === 1)
    assert(rows(ps.executeNamed(sel.id, Map("x" -> 1))) === Set(Seq(20), Seq(30)))
    // missing name errors
    val ex = intercept[RuntimeException](ps.executeNamed(ins.id, Map("key" -> 9)))
    assert(ex.getMessage.contains("Missing value for bind marker"))
  }

  test("system.prepared_statements serves the live prepare registry " +
    "(SystemKeyspace.java:108,299 — exact reference column names)") {
    val e = new CqlEngine(spark)
    val ps = new PreparedStatements(e)
    e.execute("CREATE TABLE pst (k int PRIMARY KEY, v int)")
    val p1 = ps.prepare("SELECT v FROM pst WHERE k = ?")
    val p2 = ps.prepare("INSERT INTO pst (k, v) VALUES (?, ?)")
    val df = e.execute("SELECT prepared_id, logged_keyspace, query_string " +
      "FROM system.prepared_statements")
    val got = df.collect().map(r =>
      (r.getAs[Array[Byte]](0).map("%02x".format(_)).mkString,
        r.getString(1), r.getString(2))).toSet
    assert(got === Set(
      (p1.id, "graft", "SELECT v FROM pst WHERE k = ?"),
      (p2.id, "graft", "INSERT INTO pst (k, v) VALUES (?, ?)")))
    // re-preparing the same statement does not duplicate the row
    ps.prepare("SELECT v FROM pst WHERE k = ?")
    assert(e.execute("SELECT count(*) FROM system.prepared_statements")
      .collect().head.getLong(0) === 2L)
  }

  test("LWT condition values bind through prepared statements") {
    val e = new CqlEngine(spark)
    val ps = new PreparedStatements(e)
    e.execute("CREATE TABLE np2 (k int PRIMARY KEY, v int)")
    e.execute("INSERT INTO np2 (k, v) VALUES (1, 5)")
    val cas = ps.prepare("UPDATE np2 SET v = ? WHERE k = ? IF v = ?")
    assert(cas.numBinds === 3)
    assert(ps.execute(cas.id, 9, 1, 4).collect().head.getBoolean(0) === false)
    assert(ps.execute(cas.id, 9, 1, 5).collect().head.getBoolean(0) === true)
    assert(rows(e.execute("SELECT v FROM np2")) === Set(Seq(9)))
  }

  test("LIMIT and PER PARTITION LIMIT bind through markers") {
    val e = new CqlEngine(spark)
    val ps = new PreparedStatements(e)
    e.execute("CREATE TABLE np3 (k int, c int, PRIMARY KEY (k, c))")
    for (k <- 1 to 2; c <- 1 to 4) e.execute(s"INSERT INTO np3 (k, c) VALUES ($k, $c)")
    val lim = ps.prepare("SELECT k, c FROM np3 LIMIT ?")
    assert(ps.execute(lim.id, 3).count() === 3)
    assert(ps.execute(lim.id, 8).count() === 8)
    val ex = intercept[RuntimeException](ps.execute(lim.id, 0).collect())
    assert(ex.getMessage.contains("strictly positive"))
    val ppl = ps.prepare("SELECT k, c FROM np3 PER PARTITION LIMIT :n")
    assert(ps.executeNamed(ppl.id, Map("n" -> 2)).count() === 4)
  }

  test("prepared statements pin the keyspace current at PREPARE time") {
    val e = new CqlEngine(spark)
    val ps = new PreparedStatements(e)
    e.execute("CREATE TABLE pin1 (k int PRIMARY KEY, v text)")
    e.execute("INSERT INTO pin1 (k, v) VALUES (1, 'default-ks')")
    e.execute("CREATE KEYSPACE ksp WITH replication = {'class': 'SimpleStrategy'}")
    e.execute("CREATE TABLE ksp.pin1 (k int PRIMARY KEY, v text)")
    e.execute("INSERT INTO ksp.pin1 (k, v) VALUES (1, 'other-ks')")
    // prepare in the default keyspace, then switch: the prepared statement
    // must keep addressing the PREPARE-time table (QueryProcessor pins the
    // keyspace into the statement id and resolution)
    val sel = ps.prepare("SELECT v FROM pin1 WHERE k = ?")
    e.execute("USE ksp")
    assert(ps.execute(sel.id, 1).collect().head.getString(0) === "default-ks")
    // the same query prepared under the new keyspace is a DIFFERENT id
    // hitting the new keyspace's table
    val sel2 = ps.prepare("SELECT v FROM pin1 WHERE k = ?")
    assert(sel2.id !== sel.id)
    assert(ps.execute(sel2.id, 1).collect().head.getString(0) === "other-ks")
    // pinned writes land in the prepare-time keyspace too
    e.execute("USE " + "graft")
    val ins = ps.prepare("INSERT INTO pin1 (k, v) VALUES (?, ?)")
    e.execute("USE ksp")
    ps.execute(ins.id, 2, "from-pinned")
    e.execute("USE graft")
    assert(e.execute("SELECT v FROM pin1 WHERE k = 2").collect()
      .head.getString(0) === "from-pinned")
    assert(e.execute("SELECT count(*) AS n FROM ksp.pin1").collect()
      .head.getLong(0) === 1L)
  }

  test("tail auto-flushes to segments once it exceeds the bound") {
    val dir = java.nio.file.Files.createTempDirectory("graft-autoflush").toString
    val e = new CqlEngine(spark)
    e.attachStorage(dir)
    e.autoFlushRows = 50
    e.execute("CREATE TABLE af1 (k int PRIMARY KEY, v int)")
    for (k <- 1 to 120) e.execute(s"INSERT INTO af1 (k, v) VALUES ($k, $k)")
    val segs = new java.io.File(new java.io.File(dir, "af1"), "segments")
    assert(segs.isDirectory && segs.list().exists(_.endsWith(".parquet")),
      "expected auto-flushed segments")
    assert(e.execute("SELECT count(*) AS n FROM af1").collect().head.getLong(0) === 120L)
  }
}
