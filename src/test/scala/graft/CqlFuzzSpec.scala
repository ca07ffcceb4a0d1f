package graft

import graft.cql.{CqlEngine, CqlParser}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Grammar-driven engine fuzz: random clause combinations — valid, invalid
  * and nonsensical alike — must either execute or fail with the engine's
  * TYPED errors (ParseException / InvalidRequest), never an untyped crash
  * out of the analyzer or restriction walk. Complements the golden
  * CQLTester cases with combinations nobody thought to write down.
  * Fixed-seed generators keep failures reproducible.
  */
class CqlFuzzSpec extends SparkSpec {

  private val selectors = Gen.oneOf(
    "*", "pk", "v", "pk, ck, v", "count(*)", "writetime(v)", "ttl(v)",
    "m[1]", "CAST(v AS text)", "toJson(v)", "s", "zz", "v + 1", "-v",
    "sum(v)", "min(ck)", "pk AS alias", "m", "token(pk)")
  private val relations = Gen.oneOf(
    "pk = 1", "pk = zz", "ck > 0", "ck < 'x'", "v = 5", "token(pk) > 0",
    "m CONTAINS 1", "m CONTAINS KEY 1", "m[1] = 2", "ck IN (1, 2)",
    "(ck) IN ((1))", "pk IN (1, 2, 3)", "v != 3", "ck >= 1 AND ck <= 5",
    "s = 9", "pk = 1 AND pk = 2", "ck = 1 AND ck > 0", "zz = 1")
  private val tails = Gen.someOf(
    "GROUP BY pk", "ORDER BY ck DESC", "ORDER BY zz ASC",
    "PER PARTITION LIMIT 1", "LIMIT 1", "LIMIT 0", "ALLOW FILTERING")

  private val selectGen: Gen[String] = for {
    dist <- Gen.oneOf("", "DISTINCT ")
    sel <- selectors
    nRel <- Gen.chooseNum(0, 3)
    rels <- Gen.listOfN(nRel, relations)
    tail <- tails
  } yield {
    val where = if (rels.isEmpty) "" else rels.mkString(" WHERE ", " AND ", "")
    s"SELECT $dist$sel FROM fz$where ${tail.mkString(" ")}"
  }

  private val mutationGen: Gen[String] = Gen.oneOf(
    for (c <- Gen.oneOf("v", "zz", "s", "m"); x <- Gen.chooseNum(-5, 5))
      yield s"UPDATE fz SET $c = $x WHERE pk = 1 AND ck = 2",
    for (ts <- Gen.chooseNum(-1L, 10L))
      yield s"UPDATE fz USING TIMESTAMP $ts SET v = 1 WHERE pk = 1 AND ck = 2",
    for (w <- Gen.oneOf("pk = 1", "pk = 1 AND ck = 2", "ck = 2", "v = 1",
      "pk = 1 AND ck > 0", "pk IN (1, 2)"))
      yield s"DELETE FROM fz WHERE $w",
    for (cols <- Gen.oneOf("(pk, ck, v)", "(pk, ck)", "(pk, v)", "(pk, ck, zz)");
         vals <- Gen.oneOf("(1, 2, 3)", "(1, 2)", "(1)", "(null, 2, 3)"))
      yield s"INSERT INTO fz $cols VALUES $vals",
    for (c <- Gen.oneOf("v", "m[1]", "m", "s", "ck"))
      yield s"DELETE $c FROM fz WHERE pk = 1 AND ck = 2",
    // LWT / CAS analyzer paths
    for (cond <- Gen.oneOf("IF v = 1", "IF v != 1", "IF v > 0", "IF zz = 1",
      "IF EXISTS", "IF s = 9", "IF m[1] = 2", "IF v = 1 AND s = 2"))
      yield s"UPDATE fz SET v = 7 WHERE pk = 1 AND ck = 2 $cond",
    Gen.oneOf(
      "INSERT INTO fz (pk, ck, v) VALUES (1, 2, 3) IF NOT EXISTS",
      "DELETE FROM fz WHERE pk = 1 AND ck = 2 IF EXISTS",
      "DELETE FROM fz WHERE pk = 1 AND ck = 2 IF v = 1",
      "DELETE FROM fz WHERE pk = 1 IF EXISTS",
      "BEGIN BATCH INSERT INTO fz (pk, ck, v) VALUES (1, 2, 3); " +
        "UPDATE fz SET v = 4 WHERE pk = 1 AND ck = 2; APPLY BATCH",
      "BEGIN UNLOGGED BATCH DELETE FROM fz WHERE pk = 1; APPLY BATCH",
      "BEGIN BATCH SELECT * FROM fz; APPLY BATCH",
      "BEGIN COUNTER BATCH UPDATE fz SET v = v + 1 WHERE pk = 1 AND ck = 2; APPLY BATCH"))

  test("random SELECT/UPDATE/DELETE/INSERT combinations execute or fail " +
    "with typed errors only") {
    val e = new CqlEngine(spark)
    e.execute("CREATE TABLE fz (pk int, ck int, v int, s int static, " +
      "m map<int, int>, PRIMARY KEY (pk, ck))")
    for (pk <- 0 to 2; ck <- 0 to 2)
      e.execute(s"INSERT INTO fz (pk, ck, v, m) VALUES ($pk, $ck, ${pk + ck}, {1: $ck})")
    val gen = Gen.frequency(3 -> selectGen, 2 -> mutationGen)
    var executed = 0
    var rejected = 0
    (0 until 120).foreach { i =>
      gen(Gen.Parameters.default.withSize(1 + i % 20), Seed(0xF0220L + i))
        .foreach { stmt =>
          try { e.execute(stmt).collect(); executed += 1 }
          catch {
            case _: CqlParser.ParseException => rejected += 1
            case _: e.InvalidRequest => rejected += 1
            case ex: Throwable =>
              fail(s"untyped ${ex.getClass.getSimpleName} on: $stmt\n${ex.getMessage}")
          }
        }
    }
    // the grammar must actually exercise both paths, or the fuzz is dead
    assert(executed > 10, s"only $executed statements executed")
    assert(rejected > 10, s"only $rejected statements rejected")
  }

  test("counter and collection mutations execute or fail typed across " +
    "random op/table combinations") {
    val e = new CqlEngine(spark)
    e.execute("CREATE TABLE fzc (pk int PRIMARY KEY, c counter)")
    e.execute("CREATE TABLE fzl (pk int PRIMARY KEY, l list<int>, " +
      "st set<text>, mp map<text, int>)")
    e.execute("UPDATE fzc SET c = c + 1 WHERE pk = 1")
    e.execute("INSERT INTO fzl (pk, l, st, mp) VALUES (1, [1, 2], {'a'}, {'k': 1})")
    val stmtGen = Gen.oneOf(
      // counter paths: deltas valid, plain sets / inserts / mixes invalid
      Gen.oneOf(
        "UPDATE fzc SET c = c + 2 WHERE pk = 1",
        "UPDATE fzc SET c = c - 1 WHERE pk = 1",
        "UPDATE fzc SET c = 5 WHERE pk = 1",
        "UPDATE fzc SET c = c + c WHERE pk = 1",
        "INSERT INTO fzc (pk, c) VALUES (1, 2)",
        "UPDATE fzc SET c = c + 1 WHERE pk = 1 IF c = 1",
        "DELETE c FROM fzc WHERE pk = 1",
        "SELECT sum(c) FROM fzc",
        "UPDATE fzl SET l = l + [1] WHERE pk = 1 IF EXISTS"),
      // collection element ops: appends/prepends/indexing/removals
      for (op <- Gen.oneOf("l = l + [9]", "l = [0] + l", "l[0] = 7",
        "l[9] = 1", "l = l - [2]", "st = st + {'z'}", "st = st - {'a'}",
        "mp['k'] = 3", "mp = mp + {'j': 2}", "l = 5", "st = st + ['x']",
        "mp['k'] = 'wrong'", "l[-1] = 0"))
        yield s"UPDATE fzl SET $op WHERE pk = 1",
      for (sel <- Gen.oneOf("l[0]", "st", "mp['k']", "mp[1]", "l[0..2]",
        "writetime(l)", "ttl(mp['k'])", "c"))
        yield s"SELECT $sel FROM fzl WHERE pk = 1",
      Gen.oneOf(
        "DELETE l[0] FROM fzl WHERE pk = 1",
        "DELETE l[5] FROM fzl WHERE pk = 1",
        "DELETE mp['k'] FROM fzl WHERE pk = 1",
        "DELETE st['a'] FROM fzl WHERE pk = 1",
        "SELECT * FROM fzl WHERE l CONTAINS 1 ALLOW FILTERING",
        "SELECT * FROM fzl WHERE mp CONTAINS KEY 'k' ALLOW FILTERING"))
    var executed = 0
    var rejected = 0
    (0 until 150).foreach { i =>
      stmtGen(Gen.Parameters.default.withSize(1 + i % 20), Seed(0xC0107L + i))
        .foreach { stmt =>
          try { e.execute(stmt).collect(); executed += 1 }
          catch {
            case _: CqlParser.ParseException => rejected += 1
            case _: e.InvalidRequest => rejected += 1
            case ex: Throwable =>
              fail(s"untyped ${ex.getClass.getSimpleName} on: $stmt\n${ex.getMessage}")
          }
        }
    }
    assert(executed > 10, s"only $executed executed")
    assert(rejected > 5, s"only $rejected rejected")
  }

  test("UDF/UDA DDL and aggregate calls (incl. multi-argument signatures) " +
    "execute or fail typed across random shapes") {
    val e = new CqlEngine(spark)
    e.execute("CREATE TABLE fzu (pk int, ck int, v int, w text, PRIMARY KEY (pk, ck))")
    for (ck <- 0 to 3)
      e.execute(s"INSERT INTO fzu (pk, ck, v, w) VALUES (1, $ck, ${ck * 2}, 't$ck')")
    e.execute("CREATE FUNCTION fz_sf1 (st int, x int) CALLED ON NULL INPUT " +
      "RETURNS int LANGUAGE spark AS 'coalesce(st, 0) + x'")
    e.execute("CREATE FUNCTION fz_sf2 (st text, a text, b int) RETURNS NULL ON NULL INPUT " +
      "RETURNS text LANGUAGE spark AS 'concat(st, a, b)'")
    e.execute("CREATE AGGREGATE fz_agg1 (int) SFUNC fz_sf1 STYPE int")
    e.execute("CREATE AGGREGATE fz_agg2 (text, int) SFUNC fz_sf2 STYPE text INITCOND ''")
    val ddlGen = Gen.oneOf(
      // arity / type / resolution edges: valid and invalid alike
      "CREATE AGGREGATE fz_x1 (int) SFUNC fz_sf2 STYPE text",
      "CREATE AGGREGATE fz_x2 (text, int) SFUNC fz_sf1 STYPE int",
      "CREATE AGGREGATE fz_x3 (int, int, int) SFUNC fz_sf1 STYPE int",
      "CREATE OR REPLACE AGGREGATE fz_agg1 (int) SFUNC fz_sf1 STYPE int",
      "CREATE AGGREGATE fz_x4 (int) SFUNC nosuch STYPE int",
      "CREATE AGGREGATE IF NOT EXISTS fz_agg1 (int) SFUNC fz_sf1 STYPE int",
      "DROP AGGREGATE fz_agg2 (text)",
      "DROP AGGREGATE IF EXISTS fz_nope (int, text)",
      "CREATE FUNCTION fz_sf1 (st int, x int) CALLED ON NULL INPUT " +
        "RETURNS int LANGUAGE spark AS 'st + x'",
      "DROP FUNCTION fz_sf2 (text, text, int)")
    val callGen = for (call <- Gen.oneOf(
      "fz_agg1(v)", "fz_agg1(w)", "fz_agg1(v, v)", "fz_agg1()",
      "fz_agg2(w, v)", "fz_agg2(v, w)", "fz_agg2(w)", "fz_agg2(w, v, v)",
      "fz_agg2(zz, v)", "fz_agg2(w, ck)"))
      yield s"SELECT $call FROM fzu WHERE pk = 1"
    var executed = 0
    var rejected = 0
    (0 until 100).foreach { i =>
      Gen.frequency(2 -> callGen, 1 -> ddlGen)(
        Gen.Parameters.default.withSize(1 + i % 10), Seed(0xADA17L + i))
        .foreach { stmt =>
          try { e.execute(stmt).collect(); executed += 1 }
          catch {
            case _: CqlParser.ParseException => rejected += 1
            case _: e.InvalidRequest => rejected += 1
            case ex: Throwable =>
              fail(s"untyped ${ex.getClass.getSimpleName} on: $stmt\n${ex.getMessage}")
          }
        }
    }
    assert(executed > 10, s"only $executed executed")
    assert(rejected > 10, s"only $rejected rejected")
  }

  test("LANGUAGE java bodies including counted loops execute or fail with " +
    "the reference's typed compile error across random shapes") {
    val e = new CqlEngine(spark)
    e.execute("CREATE TABLE fzj (pk int PRIMARY KEY, v int, t text)")
    e.execute("INSERT INTO fzj (pk, v, t) VALUES (1, 3, 'ab')")
    e.execute("INSERT INTO fzj (pk, v, t) VALUES (2, 0, 'x')")
    // every body RETURNS text; half translate and execute, half hit the
    // shim's rejection boundary with the reference's compile-error text
    val bodies = Seq(
      "int r = 0; for (int i = 0; i <= x; i++) { r += i; } return \"\" + r;",
      "StringBuilder sb = new StringBuilder(); for (int i = 0; i < x; i++) sb.append(s); return sb.toString();",
      "long p = 1; for (int i = 1; i < 4; i++) { p = p * 2; } return \"\" + (p + x);",
      "int r = x; for (int i = 0; i < 3; i++) { r = r + i; r += 1; } return \"\" + r;",
      // reference-style rejections: while, decrement, stride, two
      // accumulators, return-in-body, accumulator-dependent bound
      "int r = 0; while (r < x) r += 1; return \"\" + r;",
      "int r = 0; for (int i = x; i > 0; i--) r += i; return \"\" + r;",
      "int r = 0; for (int i = 0; i < x; i += 2) r += i; return \"\" + r;",
      "int r = 0; int q = 0; for (int i = 0; i < x; i++) { r += i; q += i; } return \"\" + (r + q);",
      "for (int i = 0; i < x; i++) return \"\" + i; return \"z\";",
      "int r = 10; for (int i = 0; i < r; i++) r -= 1; return \"\" + r;")
    var executed = 0
    var rejected = 0
    val rnd = new scala.util.Random(0xF22)
    (0 until 60).foreach { i =>
      val body = bodies(rnd.nextInt(bodies.length))
      val (sig, call) =
        if (body.contains("(s)")) ("(x int, s text)", "(v, t)")
        else ("(x int)", "(v)")
      val stmt = s"CREATE OR REPLACE FUNCTION fzj_f$i $sig " +
        "RETURNS NULL ON NULL INPUT RETURNS text LANGUAGE java AS " +
        "$$" + body + "$$"
      try {
        e.execute(stmt).collect()
        e.execute(s"SELECT fzj_f$i$call FROM fzj WHERE pk = 1").collect()
        executed += 1
      } catch {
        case ex: e.InvalidRequest
          if ex.getMessage.contains("Could not compile function") => rejected += 1
        case ex: Throwable =>
          fail(s"untyped ${ex.getClass.getSimpleName} on: $stmt\n${ex.getMessage}")
      }
    }
    assert(executed > 5, s"only $executed executed")
    assert(rejected > 5, s"only $rejected rejected")
  }
}
