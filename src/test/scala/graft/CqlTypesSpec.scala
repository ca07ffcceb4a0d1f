package graft

import graft.cql.{CqlEngine, CqlValues}
import graft.functions.TimeUuid

/** CQL type-system round trips and comparator fidelity. Cases mined from
  * the reference validation suites (`cql3/validation/entities/TypeTest.java`,
  * `TimeuuidTest.java`, `DateTypeTest.java`,
  * `operations/InsertUpdateIfConditionTest.java`).
  */
class CqlTypesSpec extends SparkSpec {

  def mkEngine: CqlEngine = new CqlEngine(spark)

  def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  def rowsInOrder(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  def assertInvalid(e: CqlEngine, cql: String, msgPart: String): Unit = {
    val ex = intercept[RuntimeException](e.execute(cql).collect())
    assert(ex.getMessage.contains(msgPart), s"got: ${ex.getMessage}")
  }

  test("timestamp round trip: string and epoch-millis literals agree") {
    val e = mkEngine
    e.execute("CREATE TABLE ts1 (k int PRIMARY KEY, t timestamp)")
    e.execute("INSERT INTO ts1 (k, t) VALUES (1, '2011-02-03 04:05:00+0000')")
    e.execute("INSERT INTO ts1 (k, t) VALUES (2, 1296705900000)")
    e.execute("INSERT INTO ts1 (k, t) VALUES (3, '2011-02-03T04:05:00.250Z')")
    e.execute("INSERT INTO ts1 (k, t) VALUES (4, '2011-02-03')")
    val got = rowsInOrder(e.execute("SELECT k, t FROM ts1"))
    assert(got.map(_.head) === Seq(1, 2, 3, 4))
    val ms = got.map(_(1).asInstanceOf[java.sql.Timestamp].getTime)
    assert(ms === Seq(1296705900000L, 1296705900000L, 1296705900250L, 1296691200000L))
    // range predicate over timestamp
    assert(rows(e.execute(
      "SELECT k FROM ts1 WHERE t >= '2011-02-03 04:05:00Z' ALLOW FILTERING")) ===
      Set(Seq(1), Seq(2), Seq(3)))
  }

  test("date and time round trips") {
    val e = mkEngine
    e.execute("CREATE TABLE dt1 (k int PRIMARY KEY, d date, t time)")
    e.execute("INSERT INTO dt1 (k, d, t) VALUES (1, '2015-05-21', '13:30:54.234')")
    val r = rowsInOrder(e.execute("SELECT k, d, t FROM dt1")).head
    assert(r(1).toString === "2015-05-21")
    assert(r(2) === ((13L * 60 + 30) * 60 + 54) * 1000000000L + 234000000L)
    assertInvalid(e, "INSERT INTO dt1 (k, d) VALUES (2, 'not-a-date')", "formatted date")
  }

  test("uuid and timeuuid literals; timeuuid requires v1") {
    val e = mkEngine
    e.execute("CREATE TABLE u1 (k int PRIMARY KEY, u uuid, tu timeuuid)")
    val v1 = TimeUuid.minTimeUuid(1296705900000L)
    e.execute(s"INSERT INTO u1 (k, u, tu) VALUES (1, 550E8400-E29B-41D4-A716-446655440000, $v1)")
    val r = rowsInOrder(e.execute("SELECT u, tu FROM u1")).head
    assert(r(0) === "550e8400-e29b-41d4-a716-446655440000")
    assert(r(1) === v1)
    // a v4 uuid is not a valid timeuuid
    assertInvalid(e, "INSERT INTO u1 (k, tu) VALUES (2, 550e8400-e29b-41d4-a716-446655440000)",
      "Invalid version for TimeUUID")
  }

  test("timeuuid clustering orders by embedded time, not string order") {
    val e = mkEngine
    e.execute("CREATE TABLE tu1 (k int, tu timeuuid, v int, PRIMARY KEY (k, tu))")
    // craft uuids whose string order inverts their time order: time_low (the
    // first string field) holds the LOW bits of the tick count
    val early = TimeUuid.maxTimeUuid(1000L)  // large clock-seq, early instant
    val late = TimeUuid.minTimeUuid(2000L)
    e.execute(s"INSERT INTO tu1 (k, tu, v) VALUES (1, $late, 2)")
    e.execute(s"INSERT INTO tu1 (k, tu, v) VALUES (1, $early, 1)")
    assert(rowsInOrder(e.execute("SELECT v FROM tu1 WHERE k = 1")) === Seq(Seq(1), Seq(2)))
    // range by embedded time: minTimeuuid boundary pattern (TimeFcts)
    val bound = TimeUuid.minTimeUuid(1500L)
    assert(rowsInOrder(e.execute(s"SELECT v FROM tu1 WHERE k = 1 AND tu > $bound")) ===
      Seq(Seq(2)))
    assert(rowsInOrder(e.execute(s"SELECT v FROM tu1 WHERE k = 1 AND tu < $bound")) ===
      Seq(Seq(1)))
    // min/max aggregate over timeuuid follow embedded time, not string order
    val mm = rowsInOrder(e.execute("SELECT min(tu), max(tu) FROM tu1")).head
    assert(mm(0).toString === early)
    assert(mm(1).toString === late)
  }

  test("blob round trip and smallint/tinyint ranges") {
    val e = mkEngine
    e.execute("CREATE TABLE b1 (k int PRIMARY KEY, b blob, s smallint, t tinyint)")
    e.execute("INSERT INTO b1 (k, b, s, t) VALUES (1, 0xCAFEBABE, 32767, -128)")
    val r = rowsInOrder(e.execute("SELECT b, s, t FROM b1")).head
    assert(CqlValues.blobHex(r(0).asInstanceOf[Array[Byte]]) === "0xcafebabe")
    assert(r(1) === 32767.toShort && r(2) === (-128).toByte)
    assertInvalid(e, "INSERT INTO b1 (k, s) VALUES (2, 40000)", "short")
    assertInvalid(e, "INSERT INTO b1 (k, t) VALUES (2, 200)", "tinyint")
  }

  test("decimal, varint, inet, ascii") {
    val e = mkEngine
    e.execute("CREATE TABLE m1 (k int PRIMARY KEY, d decimal, v varint, i inet, a ascii)")
    e.execute("INSERT INTO m1 (k, d, v, i, a) VALUES (1, 12.345, 99999999999, '192.168.0.1', 'ok')")
    val r = rowsInOrder(e.execute("SELECT d, v, i, a FROM m1")).head
    assert(r(0).asInstanceOf[java.math.BigDecimal].compareTo(new java.math.BigDecimal("12.345")) === 0)
    assert(r(1).asInstanceOf[java.math.BigDecimal].longValueExact === 99999999999L)
    assert(r(2) === "192.168.0.1" && r(3) === "ok")
    assertInvalid(e, "INSERT INTO m1 (k, i) VALUES (2, '999.0.0.1')", "inet")
    assertInvalid(e, "INSERT INTO m1 (k, a) VALUES (2, 'café')", "ASCII")
  }

  test("set/map ordering is type-aware: {2, 10} stores numerically") {
    val e = mkEngine
    e.execute("CREATE TABLE s1 (k int PRIMARY KEY, s set<int>, m map<int, text>)")
    e.execute("INSERT INTO s1 (k, s, m) VALUES (1, {10, 2, 5}, {10: 'x', 2: 'y'})")
    val r = rowsInOrder(e.execute("SELECT s, m FROM s1")).head
    assert(r(0).asInstanceOf[scala.collection.Seq[Int]].toSeq === Seq(2, 5, 10))
    // storage (array) order of map keys — collect() into a Scala Map would
    // not preserve it
    val keys = e.execute("SELECT m FROM s1")
      .select(org.apache.spark.sql.functions.map_keys(
        org.apache.spark.sql.functions.col("m")))
      .collect().head.getAs[scala.collection.Seq[Int]](0)
    assert(keys.toSeq === Seq(2, 10))
    // the element-add path must produce the same order as a literal write
    e.execute("CREATE TABLE s2 (k int PRIMARY KEY, s set<int>)")
    e.execute("INSERT INTO s2 (k, s) VALUES (1, {2})")
    e.execute("UPDATE s2 SET s = s + {10, 5} WHERE k = 1")
    assert(rowsInOrder(e.execute("SELECT s FROM s2")).head.head === Seq(2, 5, 10))
  }

  test("SELECT JSON / INSERT JSON round-trip the new types in CQL forms") {
    val e = mkEngine
    e.execute("CREATE TABLE js1 (k int PRIMARY KEY, ts timestamp, t time, b blob, u uuid)")
    e.execute("INSERT INTO js1 (k, ts, t, b, u) VALUES " +
      "(1, '2011-02-03 04:05:00.250Z', '08:12:54.123456789', 0xCAFE, 550e8400-e29b-41d4-a716-446655440000)")
    val js = e.execute("SELECT JSON k, ts, t, b, u FROM js1").collect().head.getString(0)
    assert(js.contains(""""ts":"2011-02-03 04:05:00.250Z""""), js)
    assert(js.contains(""""t":"08:12:54.123456789""""), js)
    assert(js.contains(""""b":"0xcafe""""), js)
    assert(js.contains(""""u":"550e8400-e29b-41d4-a716-446655440000""""), js)
    // INSERT JSON accepts the same string forms back
    e.execute("""INSERT INTO js1 JSON '{"k": 2, "ts": "2011-02-03 04:05:00.250Z", "b": "0xCAFE"}'""")
    val r = rowsInOrder(e.execute("SELECT ts, b FROM js1 WHERE k = 2")).head
    assert(r(0).asInstanceOf[java.sql.Timestamp].getTime === 1296705900250L)
    assert(CqlValues.blobHex(r(1).asInstanceOf[Array[Byte]]) === "0xcafe")
  }

  test("failed LWT returns [applied]=false plus current values") {
    val e = mkEngine
    e.execute("CREATE TABLE lw1 (k int PRIMARY KEY, v int, w text)")
    e.execute("INSERT INTO lw1 (k, v, w) VALUES (1, 10, 'x')")
    val fail = e.execute("UPDATE lw1 SET v = 99 WHERE k = 1 IF v = 11")
    assert(rowsInOrder(fail) === Seq(Seq(false, 1, 10, "x")))
    assert(rows(e.execute("SELECT v FROM lw1")) === Set(Seq(10)))
    val ok = e.execute("UPDATE lw1 SET v = 99 WHERE k = 1 IF v = 10")
    assert(rowsInOrder(ok) === Seq(Seq(true)))
    assert(rows(e.execute("SELECT v FROM lw1")) === Set(Seq(99)))
    // failed INSERT IF NOT EXISTS also returns the live row
    val dup = e.execute("INSERT INTO lw1 (k, v, w) VALUES (1, 0, 'z') IF NOT EXISTS")
    assert(rowsInOrder(dup) === Seq(Seq(false, 1, 99, "x")))
  }

  test("token() hashes the marshal wire form for every PK type") {
    import graft.functions.{BlobConversions => B, CassandraMurmur3 => M}
    val e = mkEngine
    e.execute("CREATE TABLE tk1 (u uuid PRIMARY KEY, v int)")
    e.execute("INSERT INTO tk1 (u, v) VALUES (550e8400-e29b-41d4-a716-446655440000, 1)")
    val uuidTok = e.execute("SELECT token(u) FROM tk1").collect().head.getLong(0)
    assert(uuidTok === M.tokenOfBytes(B.uuidAsBlob("550e8400-e29b-41d4-a716-446655440000")))
    e.execute("CREATE TABLE tk2 (t timestamp PRIMARY KEY, v int)")
    e.execute("INSERT INTO tk2 (t, v) VALUES (1296705900000, 1)")
    val tsTok = e.execute("SELECT token(t) FROM tk2").collect().head.getLong(0)
    assert(tsTok === M.tokenOfBytes(B.bigintAsBlob(1296705900000L)))
    e.execute("CREATE TABLE tk3 (d date PRIMARY KEY, v int)")
    e.execute("INSERT INTO tk3 (d, v) VALUES ('1970-01-11', 1)")
    val dTok = e.execute("SELECT token(d) FROM tk3").collect().head.getLong(0)
    assert(dTok === M.tokenOfBytes(B.dateAsBlob(10)))
  }

  test("write-path validation: counter TTL/timestamp, clustering on INSERT") {
    val e = mkEngine
    e.execute("CREATE TABLE wv1 (k int, c int, v int, s text static, PRIMARY KEY (k, c))")
    assertInvalid(e, "INSERT INTO wv1 (k, v) VALUES (1, 5)", "clustering keys are missing")
    // static-only insert addresses the partition — no clustering needed
    e.execute("INSERT INTO wv1 (k, s) VALUES (1, 'static-only')")
    assert(rowsInOrder(e.execute("SELECT k, s FROM wv1")) === Seq(Seq(1, "static-only")))
    e.execute("CREATE TABLE wv2 (k int PRIMARY KEY, n counter)")
    assertInvalid(e, "UPDATE wv2 USING TTL 5 SET n = n + 1 WHERE k = 1",
      "counter updates")
    assertInvalid(e, "UPDATE wv2 USING TIMESTAMP 99 SET n = n + 1 WHERE k = 1",
      "counter updates")
    // counter updates inside a batch stay legal (COUNTER batch)
    e.execute("BEGIN COUNTER BATCH UPDATE wv2 SET n = n + 2 WHERE k = 1; " +
      "UPDATE wv2 SET n = n + 3 WHERE k = 1; APPLY BATCH")
    assert(rowsInOrder(e.execute("SELECT n FROM wv2")) === Seq(Seq(5L)))
  }

  test("LWT on timestamp/decimal columns compares by type order") {
    val e = mkEngine
    e.execute("CREATE TABLE lw2 (k int PRIMARY KEY, t timestamp, d decimal)")
    e.execute("INSERT INTO lw2 (k, t, d) VALUES (1, '2011-02-03 04:05:00Z', 5.5)")
    assert(rowsInOrder(e.execute(
      "UPDATE lw2 SET d = 9.9 WHERE k = 1 IF t < '2012-01-01' AND d > 5.0")).head.head === true)
    assert(rowsInOrder(e.execute("SELECT d FROM lw2")).head.head
      .asInstanceOf[java.math.BigDecimal].compareTo(new java.math.BigDecimal("9.9")) === 0)
  }
}
