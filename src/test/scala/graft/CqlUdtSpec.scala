package graft

import graft.cql.CqlEngine
import org.apache.spark.sql.Row

/** Tuples, user-defined types, multi-column tuple relations and map-entry
  * restrictions. Cases mined from `cql3/validation/entities/UserTypesTest
  * .java`, `TupleTypeTest.java`, `operations/SelectMultiColumnRelationTest
  * .java`, `SecondaryIndexOnMapEntriesTest.java`.
  */
class CqlUdtSpec extends SparkSpec {

  def mkEngine: CqlEngine = new CqlEngine(spark)

  def rowsInOrder(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  def assertInvalid(e: CqlEngine, cql: String, msgPart: String): Unit = {
    val ex = intercept[RuntimeException](e.execute(cql).collect())
    assert(ex.getMessage.contains(msgPart), s"got: ${ex.getMessage}")
  }

  test("frozen tuple round trip, shorter literal, lexicographic compare") {
    val e = mkEngine
    e.execute("CREATE TABLE tp1 (k int PRIMARY KEY, t tuple<int, text, double>)")
    e.execute("INSERT INTO tp1 (k, t) VALUES (1, (3, 'foo', 2.5))")
    e.execute("INSERT INTO tp1 (k, t) VALUES (2, (3, 'bar'))")
    val got = rowsInOrder(e.execute("SELECT k, t FROM tp1"))
    assert(got(0)(1).asInstanceOf[Row].toSeq === Seq(3, "foo", 2.5))
    assert(got(1)(1).asInstanceOf[Row].toSeq === Seq(3, "bar", null))
    // full-value equality needs filtering
    assert(rowsInOrder(e.execute(
      "SELECT k FROM tp1 WHERE t = (3, 'foo', 2.5) ALLOW FILTERING")) === Seq(Seq(1)))
    assertInvalid(e, "INSERT INTO tp1 (k, t) VALUES (3, (1, 'x', 2.0, 9))", "too many")
  }

  test("CREATE TYPE + UDT round trip and field selection") {
    val e = mkEngine
    e.execute("CREATE TYPE address (street text, city text, zip int)")
    e.execute("CREATE TABLE u1 (k int PRIMARY KEY, a frozen<address>)")
    e.execute("INSERT INTO u1 (k, a) VALUES (1, {street: '12 Main', city: 'Springfield', zip: 12345})")
    // partial literal: missing fields null
    e.execute("INSERT INTO u1 (k, a) VALUES (2, {city: 'Shelbyville'})")
    val got = rowsInOrder(e.execute("SELECT k, a FROM u1"))
    assert(got(0)(1).asInstanceOf[Row].toSeq === Seq("12 Main", "Springfield", 12345))
    assert(got(1)(1).asInstanceOf[Row].toSeq === Seq(null, "Shelbyville", null))
    // field selection u.f
    assert(rowsInOrder(e.execute("SELECT k, a.city, a.zip FROM u1")) ===
      Seq(Seq(1, "Springfield", 12345), Seq(2, "Shelbyville", null)))
    assertInvalid(e, "INSERT INTO u1 (k, a) VALUES (3, {country: 'US'})", "Unknown field")
    assertInvalid(e, "SELECT a.nope FROM u1", "Unknown field")
    assertInvalid(e, "CREATE TYPE address (x int)", "already exists")
    // unspaced field:value — the ':' here is a separator, not a bind marker
    e.execute("INSERT INTO u1 (k, a) VALUES (4, {street:'1 Elm', zip:99})")
    assert(rowsInOrder(e.execute("SELECT a.street, a.zip FROM u1 WHERE k = 4")) ===
      Seq(Seq("1 Elm", 99)))
    // ... including boolean/ident-looking values ({active:true} shape)
    e.execute("CREATE TYPE flags (active boolean, level int)")
    e.execute("CREATE TABLE u1b (k int PRIMARY KEY, f frozen<flags>)")
    e.execute("INSERT INTO u1b (k, f) VALUES (1, {active:true, level:2})")
    assert(rowsInOrder(e.execute("SELECT f.active, f.level FROM u1b")) ===
      Seq(Seq(true, 2)))
    // fields named like term-introducing keywords (key/ttl/like/contains)
    // with unspaced ident-like values: inside {...} the ':' is a separator,
    // never a bind-marker prefix
    e.execute("CREATE TYPE kwf (key boolean, ttl int, contains text)")
    e.execute("CREATE TABLE u1c (k int PRIMARY KEY, f frozen<kwf>)")
    e.execute("INSERT INTO u1c (k, f) VALUES (1, {key:true, ttl:5, contains:'x'})")
    assert(rowsInOrder(e.execute("SELECT f.key, f.ttl, f.contains FROM u1c")) ===
      Seq(Seq(true, 5, "x")))
  }

  test("UDT inside collections and as clustering-ish value") {
    val e = mkEngine
    e.execute("CREATE TYPE pt (x int, y int)")
    e.execute("CREATE TABLE u2 (k int PRIMARY KEY, pts list<frozen<pt>>)")
    e.execute("INSERT INTO u2 (k, pts) VALUES (1, [{x: 1, y: 2}, {x: 3, y: 4}])")
    val got = rowsInOrder(e.execute("SELECT pts FROM u2")).head.head
      .asInstanceOf[scala.collection.Seq[Row]]
    assert(got.map(_.toSeq) === Seq(Seq(1, 2), Seq(3, 4)))
  }

  test("tuple as clustering column orders and ranges lexicographically") {
    val e = mkEngine
    e.execute("CREATE TABLE tc1 (k int, t frozen<tuple<int, text>>, v int, PRIMARY KEY (k, t))")
    e.execute("INSERT INTO tc1 (k, t, v) VALUES (1, (2, 'b'), 1)")
    e.execute("INSERT INTO tc1 (k, t, v) VALUES (1, (1, 'z'), 2)")
    e.execute("INSERT INTO tc1 (k, t, v) VALUES (1, (2, 'a'), 3)")
    // clustering order = lexicographic tuple order
    assert(rowsInOrder(e.execute("SELECT v FROM tc1 WHERE k = 1")) ===
      Seq(Seq(2), Seq(3), Seq(1)))
    assert(rowsInOrder(e.execute("SELECT v FROM tc1 WHERE k = 1 AND t > (1, 'z')")) ===
      Seq(Seq(3), Seq(1)))
  }

  test("nested UDTs resolve through the type catalog") {
    val e = mkEngine
    e.execute("CREATE TYPE inner_pt (x int, y int)")
    e.execute("CREATE TYPE shape (name text, center frozen<inner_pt>)")
    e.execute("CREATE TABLE nu1 (k int PRIMARY KEY, s frozen<shape>)")
    e.execute("INSERT INTO nu1 (k, s) VALUES (1, {name: 'dot', center: {x: 3, y: 4}})")
    val r = rowsInOrder(e.execute("SELECT s FROM nu1")).head.head
      .asInstanceOf[org.apache.spark.sql.Row]
    assert(r.getString(0) === "dot")
    assert(r.getStruct(1).toSeq === Seq(3, 4))
  }

  test("multi-column tuple relations on clustering prefix") {
    val e = mkEngine
    e.execute("CREATE TABLE mc1 (k int, c1 int, c2 int, v int, PRIMARY KEY (k, c1, c2))")
    for (c1 <- 0 until 3; c2 <- 0 until 3)
      e.execute(s"INSERT INTO mc1 (k, c1, c2, v) VALUES (1, $c1, $c2, ${c1 * 10 + c2})")
    assert(rowsInOrder(e.execute(
      "SELECT v FROM mc1 WHERE k = 1 AND (c1, c2) > (1, 1) AND (c1, c2) <= (2, 1)")) ===
      Seq(Seq(12), Seq(20), Seq(21)))
    assert(rowsInOrder(e.execute(
      "SELECT v FROM mc1 WHERE k = 1 AND (c1, c2) = (2, 2)")) === Seq(Seq(22)))
    assertInvalid(e, "SELECT v FROM mc1 WHERE k = 1 AND (c2, c1) > (1, 1)",
      "PRIMARY KEY order")
    assertInvalid(e, "SELECT v FROM mc1 WHERE k = 1 AND (k, c1) > (1, 1)",
      "clustering columns")
  }

  test("map-entry equality m[k] = v requires filtering and matches entries") {
    val e = mkEngine
    e.execute("CREATE TABLE me1 (k int PRIMARY KEY, m map<text, int>)")
    e.execute("INSERT INTO me1 (k, m) VALUES (1, {'a': 1, 'b': 2})")
    e.execute("INSERT INTO me1 (k, m) VALUES (2, {'a': 2})")
    e.execute("INSERT INTO me1 (k, m) VALUES (3, {'b': 1})")
    assert(rowsInOrder(e.execute(
      "SELECT k FROM me1 WHERE m['a'] = 1 ALLOW FILTERING")) === Seq(Seq(1)))
    assert(rowsInOrder(e.execute(
      "SELECT k FROM me1 WHERE m['b'] = 2 ALLOW FILTERING")) === Seq(Seq(1)))
    assertInvalid(e, "SELECT k FROM me1 WHERE m['a'] = 1", "ALLOW FILTERING")
  }

  test("ALTER TYPE ADD widens populated tables; old rows read null for the new field") {
    val e = mkEngine
    e.execute("CREATE TYPE pt (x int, y int)")
    e.execute("CREATE TABLE at1 (k int PRIMARY KEY, p frozen<pt>, ps list<frozen<pt>>)")
    e.execute("INSERT INTO at1 (k, p, ps) VALUES (1, {x: 1, y: 2}, [{x: 3, y: 4}])")
    e.execute("ALTER TYPE pt ADD z text")
    // pre-ALTER rows surface the new field as null — top-level and nested
    val got = rowsInOrder(e.execute("SELECT k, p.x, p.z, ps FROM at1 WHERE k = 1")).head
    assert(got(1) === 1 && got(2) === null)
    assert(got(3).asInstanceOf[scala.collection.Seq[Row]].head.toSeq === Seq(3, 4, null))
    // post-ALTER inserts can set it
    e.execute("INSERT INTO at1 (k, p) VALUES (2, {x: 9, y: 8, z: 'hi'})")
    assert(rowsInOrder(e.execute("SELECT p.z FROM at1 WHERE k = 2")) === Seq(Seq("hi")))
  }

  test("ALTER TYPE ADD after a durable flush: parquet structs widen by name") {
    val e = mkEngine
    val dir = java.nio.file.Files.createTempDirectory("graft-altertype").toString
    e.attachStorage(dir)
    e.execute("CREATE TYPE dt (a int, b text)")
    e.execute("CREATE TABLE at2 (k int PRIMARY KEY, d frozen<dt>)")
    e.execute("INSERT INTO at2 (k, d) VALUES (1, {a: 1, b: 'one'})")
    e.flush("at2") // rows now live in a parquet segment with the OLD struct
    e.execute("ALTER TYPE dt ADD c double")
    e.execute("INSERT INTO at2 (k, d) VALUES (2, {a: 2, b: 'two', c: 2.5})")
    val got = rowsInOrder(e.execute("SELECT k, d.a, d.c FROM at2"))
    assert(got === Seq(Seq(1, 1, null), Seq(2, 2, 2.5)))
    // RENAME is refused once a using table has flushed (fields are
    // addressed by name in the durable parquet)
    assertInvalid(e, "ALTER TYPE dt RENAME a TO alpha", "address fields by name")
  }

  test("ALTER TYPE RENAME is metadata-only on unflushed tables") {
    val e = mkEngine
    e.execute("CREATE TYPE rt (a int, b text)")
    e.execute("CREATE TABLE at3 (k int PRIMARY KEY, r frozen<rt>)")
    e.execute("INSERT INTO at3 (k, r) VALUES (1, {a: 7, b: 'x'})")
    e.execute("ALTER TYPE rt RENAME a TO alpha AND b TO beta")
    assert(rowsInOrder(e.execute("SELECT r.alpha, r.beta FROM at3")) === Seq(Seq(7, "x")))
    assertInvalid(e, "SELECT r.a FROM at3", "Unknown field")
    // new literals use the new field names
    e.execute("INSERT INTO at3 (k, r) VALUES (2, {alpha: 8, beta: 'y'})")
    assert(rowsInOrder(e.execute("SELECT r.alpha FROM at3 WHERE k = 2")) === Seq(Seq(8)))
  }

  test("ALTER TYPE validation follows AlterTypeStatement") {
    val e = mkEngine
    e.execute("CREATE TYPE vt (a int)")
    assertInvalid(e, "ALTER TYPE nosuch ADD x int", "doesn't exist")
    assertInvalid(e, "ALTER TYPE vt ADD a text", "already exists")
    assertInvalid(e, "ALTER TYPE vt RENAME q TO r", "field q")
    e.execute("CREATE TYPE vt2 (p frozen<vt>)")
    assertInvalid(e, "ALTER TYPE vt ADD self frozen<vt>", "circular reference")
    // AlterTypeStatement.java:165-175
    assertInvalid(e, "ALTER TYPE vt ALTER a TYPE text", "no longer supported")
    // a rename propagates into OTHER UDTs embedding this one
    e.execute("ALTER TYPE vt RENAME a TO z")
    e.execute("CREATE TABLE at4 (k int PRIMARY KEY, w frozen<vt2>)")
    e.execute("INSERT INTO at4 (k, w) VALUES (1, {p: {z: 5}})")
    assert(rowsInOrder(e.execute("SELECT w.p FROM at4")).head.head
      .asInstanceOf[Row].toSeq === Seq(5))
  }
}
