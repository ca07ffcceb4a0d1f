package graft

import graft.cql.CqlEngine

/** Per-element writetime()/ttl() on multi-cell sets and maps — forward-port
  * of CASSANDRA-8877 (the 4.0 reference rejects these selectors; newer
  * Cassandra returns a list, one entry per cell in iteration order).
  */
class CqlCollWritetimeSpec extends SparkSpec {

  def mkEngine: CqlEngine = new CqlEngine(spark)

  def first(df: org.apache.spark.sql.DataFrame): Seq[Any] =
    df.collect().head.toSeq

  def longs(v: Any): Seq[Long] =
    v.asInstanceOf[scala.collection.Seq[Any]].toSeq
      .map(_.asInstanceOf[Number].longValue())

  def assertInvalid(e: CqlEngine, cql: String, msgPart: String): Unit = {
    val ex = intercept[RuntimeException](e.execute(cql).collect())
    assert(ex.getMessage.contains(msgPart), s"got: ${ex.getMessage}")
  }

  test("writetime(set) returns one timestamp per element, add updates it") {
    val e = mkEngine
    e.execute("CREATE TABLE cw1 (k int PRIMARY KEY, s set<int>)")
    e.execute("INSERT INTO cw1 (k, s) VALUES (1, {10, 20}) USING TIMESTAMP 100")
    e.execute("UPDATE cw1 USING TIMESTAMP 200 SET s = s + {5} WHERE k = 1")
    // re-adding 20 refreshes ITS cell timestamp only
    e.execute("UPDATE cw1 USING TIMESTAMP 300 SET s = s + {20} WHERE k = 1")
    val r = first(e.execute("SELECT s, writetime(s) FROM cw1"))
    assert(longs(r(0)).map(_.toInt) === Seq(5, 10, 20))
    assert(longs(r(1)) === Seq(200L, 100L, 300L))
    // removal drops the element's entry
    e.execute("UPDATE cw1 USING TIMESTAMP 400 SET s = s - {10} WHERE k = 1")
    val r2 = first(e.execute("SELECT writetime(s) FROM cw1"))
    assert(longs(r2(0)) === Seq(200L, 300L))
  }

  test("writetime(map) lists per-key timestamps in key order") {
    val e = mkEngine
    e.execute("CREATE TABLE cw2 (k int PRIMARY KEY, m map<text, int>)")
    e.execute("INSERT INTO cw2 (k, m) VALUES (1, {'a': 1, 'c': 3}) USING TIMESTAMP 10")
    e.execute("UPDATE cw2 USING TIMESTAMP 20 SET m = m + {'b': 2} WHERE k = 1")
    e.execute("UPDATE cw2 USING TIMESTAMP 30 SET m['c'] = 33 WHERE k = 1")
    val r = first(e.execute("SELECT writetime(m) FROM cw2"))
    assert(longs(r(0)) === Seq(10L, 20L, 30L)) // keys a, b, c
    // full overwrite resets every cell
    e.execute("INSERT INTO cw2 (k, m) VALUES (1, {'z': 9}) USING TIMESTAMP 40")
    assert(longs(first(e.execute("SELECT writetime(m) FROM cw2"))(0)) === Seq(40L))
  }

  test("ttl(set) lists remaining per-element ttls, null for no-ttl cells") {
    val e = mkEngine
    e.nowMicros = 1000L * 1000000L
    e.execute("CREATE TABLE cw3 (k int PRIMARY KEY, s set<int>)")
    e.execute("INSERT INTO cw3 (k, s) VALUES (1, {1}) USING TIMESTAMP " + (1000L * 1000000L))
    e.execute("UPDATE cw3 USING TIMESTAMP " + (1000L * 1000000L) +
      " AND TTL 60 SET s = s + {2} WHERE k = 1")
    val r = first(e.execute("SELECT ttl(s) FROM cw3"))
    val ttls = r(0).asInstanceOf[scala.collection.Seq[Any]].toSeq
    assert(ttls(0) === null)
    assert(ttls(1) === 60)
    // past expiry the cell AND its metadata disappear
    e.nowMicros = 1061L * 1000000L
    val r2 = first(e.execute("SELECT s, ttl(s), writetime(s) FROM cw3"))
    assert(longs(r2(0)).map(_.toInt) === Seq(1))
    assert(r2(1).asInstanceOf[scala.collection.Seq[Any]].toSeq === Seq(null))
  }

  test("collection writetime survives compaction (sets and lists)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cwt").toString
    val e = mkEngine
    e.attachStorage(dir)
    e.execute("CREATE TABLE cw4 (k int PRIMARY KEY, s set<text>, l list<int>)")
    e.execute("INSERT INTO cw4 (k, s, l) VALUES (1, {'x'}, [1]) USING TIMESTAMP 7")
    e.compact("cw4")
    e.execute("UPDATE cw4 USING TIMESTAMP 9 SET s = s + {'y'} WHERE k = 1")
    e.execute("UPDATE cw4 USING TIMESTAMP 9 SET l = l + [2] WHERE k = 1")
    val r = first(e.execute("SELECT writetime(s), writetime(l) FROM cw4"))
    assert(longs(r(0)) === Seq(7L, 9L))
    assert(longs(r(1)) === Seq(7L, 9L))
    assertInvalid(e, "SELECT writetime(k) FROM cw4", "PRIMARY KEY part")
  }

  test("writetime(list) is position-keyed: append/prepend/set-by-index stamps") {
    val e = mkEngine
    e.execute("CREATE TABLE cw5 (k int PRIMARY KEY, l list<text>)")
    e.execute("INSERT INTO cw5 (k, l) VALUES (1, ['a', 'b']) USING TIMESTAMP 100")
    e.execute("UPDATE cw5 USING TIMESTAMP 200 SET l = l + ['c'] WHERE k = 1")
    e.execute("UPDATE cw5 USING TIMESTAMP 300 SET l = ['z'] + l WHERE k = 1")
    // list is now [z, a, b, c]; each position keeps its writing stamp
    val r = first(e.execute("SELECT l, writetime(l) FROM cw5"))
    assert(r(0).asInstanceOf[scala.collection.Seq[Any]].toSeq === Seq("z", "a", "b", "c"))
    assert(longs(r(1)) === Seq(300L, 100L, 100L, 200L))
    // set-by-index re-stamps ONE position (duplicate values keep their own
    // stamps — position-keyed, unlike the set/map element fold)
    e.execute("UPDATE cw5 USING TIMESTAMP 400 SET l[2] = 'b2' WHERE k = 1")
    val r2 = first(e.execute("SELECT l, writetime(l) FROM cw5"))
    assert(r2(0).asInstanceOf[scala.collection.Seq[Any]].toSeq === Seq("z", "a", "b2", "c"))
    assert(longs(r2(1)) === Seq(300L, 100L, 400L, 200L))
    // delete-by-index drops the position's stamp (pinned timestamp, so the
    // later full overwrite below still wins LWW)
    e.execute("DELETE l[0] FROM cw5 USING TIMESTAMP 450 WHERE k = 1")
    assert(longs(first(e.execute("SELECT writetime(l) FROM cw5"))(0)) ===
      Seq(100L, 400L, 200L))
    // full overwrite re-stamps everything
    e.execute("UPDATE cw5 USING TIMESTAMP 500 SET l = ['q'] WHERE k = 1")
    assert(longs(first(e.execute("SELECT writetime(l) FROM cw5"))(0)) === Seq(500L))
  }

  test("ttl(list) lists remaining per-position ttls, null for no-ttl cells") {
    val e = mkEngine
    e.execute("CREATE TABLE cw6 (k int PRIMARY KEY, l list<int>)")
    e.execute("INSERT INTO cw6 (k, l) VALUES (1, [1, 2])")
    e.execute("UPDATE cw6 USING TTL 10000 SET l = l + [3] WHERE k = 1")
    val r = first(e.execute("SELECT ttl(l) FROM cw6"))
      .head.asInstanceOf[scala.collection.Seq[Any]].toSeq
    assert(r.length === 3)
    assert(r(0) === null && r(1) === null)
    assert(r(2).asInstanceOf[Number].intValue() > 9000)
  }
}
