package graft

import graft.cql.CqlEngine

/** Virtual tables, collection slice selection, CREATE FUNCTION and CREATE
  * AGGREGATE (reference `db/virtual/SystemViewsKeyspace.java`,
  * `cql3/selection/ElementsSelector.java:40-325`, `UDFunction.java`,
  * `UDAggregate.java:44-120`; UDA cases mirror `cql3/validation/operations/
  * AggregationTest.java` user-aggregate basics).
  */
class CqlDdlSpec extends SparkSpec {

  def mkEngine: CqlEngine = new CqlEngine(spark)

  def rowsInOrder(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq).toSeq

  def assertInvalid(e: CqlEngine, cql: String, msgPart: String): Unit = {
    val ex = intercept[RuntimeException](e.execute(cql).collect())
    assert(ex.getMessage.contains(msgPart), s"got: ${ex.getMessage}")
  }

  test("system_schema virtual tables reflect the catalog") {
    val e = mkEngine
    e.execute("CREATE TABLE vt_a (k int, c text, v double, PRIMARY KEY (k, c))")
    e.execute("CREATE TYPE vt_t (x int, y text)")
    assert(rowsInOrder(e.execute(
      "SELECT table_name FROM system_schema.tables")).contains(Seq("vt_a")))
    val cols = rowsInOrder(e.execute(
      "SELECT column_name, kind, position, type FROM system_schema.columns " +
        "WHERE keyspace_name = 'graft' AND table_name = 'vt_a'"))
    assert(cols.contains(Seq("k", "partition_key", 0, "int")))
    assert(cols.contains(Seq("c", "clustering", 0, "text")))
    assert(cols.contains(Seq("v", "regular", -1, "double")))
    val types = rowsInOrder(e.execute("SELECT type_name FROM system_schema.types"))
    assert(types.contains(Seq("vt_t")))
    assert(rowsInOrder(e.execute("SELECT key FROM system.local")) === Seq(Seq("local")))
    // single-node ring: peers exists and is empty (drivers query it at connect)
    assert(e.execute("SELECT peer FROM system.peers").collect().isEmpty)
    // size_estimates serves live per-table stats over the full token range
    // (what the Spark connector reads for split planning)
    e.execute("INSERT INTO vt_a (k, c, v) VALUES (1, 'x', 1.0)")
    e.execute("INSERT INTO vt_a (k, c, v) VALUES (1, 'y', 2.0)")
    e.execute("INSERT INTO vt_a (k, c, v) VALUES (2, 'x', 3.0)")
    val se = e.execute("SELECT range_start, range_end, partitions_count, mean_partition_size " +
      "FROM system.size_estimates WHERE keyspace_name = 'graft' AND table_name = 'vt_a'")
      .collect().head
    assert(se.getString(0) === Long.MinValue.toString)
    assert(se.getString(1) === Long.MaxValue.toString)
    assert(se.getLong(2) === 2L, "two live partition keys")
    assert(se.getLong(3) > 0L)
    // views/functions/aggregates reflect the live registries
    e.execute("CREATE MATERIALIZED VIEW vt_mv AS SELECT c, k, v FROM vt_a " +
      "WHERE c IS NOT NULL AND k IS NOT NULL PRIMARY KEY (c, k)")
    assert(rowsInOrder(e.execute(
      "SELECT view_name, base_table_name FROM system_schema.views"))
      .contains(Seq("vt_mv", "vt_a")))
    e.execute("CREATE FUNCTION vt_f (x int) RETURNS NULL ON NULL INPUT " +
      "RETURNS int LANGUAGE spark AS 'x + 1'")
    e.execute("CREATE FUNCTION vt_sf (st int, v int) CALLED ON NULL INPUT " +
      "RETURNS int LANGUAGE spark AS 'coalesce(st, 0) + v'")
    e.execute("CREATE AGGREGATE vt_agg (int) SFUNC vt_sf STYPE int")
    val fr = e.execute("SELECT function_name, language, return_type, called_on_null_input " +
      "FROM system_schema.functions WHERE keyspace_name = 'graft' AND function_name = 'vt_f'").collect().head
    assert(fr.getString(1) === "spark" && fr.getString(2) === "int" && !fr.getBoolean(3))
    val agr = e.execute("SELECT aggregate_name, state_func, state_type " +
      "FROM system_schema.aggregates WHERE keyspace_name = 'graft' AND aggregate_name = 'vt_agg'").collect().head
    assert(agr.getString(1) === "vt_sf" && agr.getString(2) === "int")
    assertInvalid(e, "INSERT INTO system_schema.tables (keyspace_name, table_name) VALUES ('x', 'y')",
      "Modification is not supported")
  }

  test("system_views virtual tables serve live session and engine state " +
    "(SystemViewsKeyspace.java catalog)") {
    val e = mkEngine
    // settings = the LIVE session SQL config: a conf set through Spark must
    // be visible on the next read
    spark.conf.set("spark.sql.graft.vt.probe", "on")
    try {
      val settings = rowsInOrder(e.execute(
        "SELECT value FROM system_views.settings WHERE name = 'spark.sql.graft.vt.probe'"))
      assert(settings === Seq(Seq("on")))
      val shuffle = rowsInOrder(e.execute(
        "SELECT value FROM system_views.settings WHERE name = 'spark.sql.shuffle.partitions'"))
      assert(shuffle === Seq(Seq(spark.conf.get("spark.sql.shuffle.partitions"))))
    } finally spark.conf.unset("spark.sql.graft.vt.probe")

    // clients: one row for this driver connection; request_count is the
    // engine's live statement counter (monotonic across executes)
    val c1 = e.execute("SELECT request_count, username FROM system_views.clients")
      .collect().head
    assert(c1.getString(1) === spark.sparkContext.sparkUser)
    val c2 = e.execute("SELECT request_count FROM system_views.clients")
      .collect().head
    assert(c2.getLong(0) > c1.getLong(0), "statement counter must advance")

    // thread_pools: scheduler gauges with the session's real parallelism cap
    val tp = e.execute("SELECT name, active_tasks_limit, completed_tasks " +
      "FROM system_views.thread_pools").collect().head
    assert(tp.getString(0) === "task-scheduler")
    assert(tp.getInt(1) === spark.sparkContext.defaultParallelism)

    // caches: block-manager capacity is the executor max-memory sum (> 0)
    val caches = rowsInOrder(e.execute("SELECT name FROM system_views.caches"))
    assert(caches.contains(Seq("block_manager_storage")))

    // sstable_tasks: with durable storage attached, a table's tail rows
    // report progress toward the flush threshold
    val dir = java.nio.file.Files.createTempDirectory("graft-vt").toString
    val es = new CqlEngine(spark)
    es.attachStorage(dir)
    es.execute("CREATE TABLE vt_s (k int PRIMARY KEY, v int)")
    es.execute("INSERT INTO vt_s (k, v) VALUES (1, 1)")
    es.execute("INSERT INTO vt_s (k, v) VALUES (2, 2)")
    val tasks = rowsInOrder(es.execute(
      "SELECT table_name, kind, progress, unit FROM system_views.sstable_tasks"))
    assert(tasks.contains(Seq("vt_s", "compaction", 2L, "rows")))
    // virtual keyspaces reject writes like every other virtual table
    assertInvalid(e, "INSERT INTO system_views.settings (name, value) VALUES ('x', 'y')",
      "Modification is not supported")
  }

  test("keyspaces: CREATE / USE / qualified names / DROP cascade") {
    val e = mkEngine
    e.execute("CREATE KEYSPACE ks1 WITH replication = {'class': 'SimpleStrategy', 'replication_factor': 1}")
    assertInvalid(e, "CREATE KEYSPACE ks1", "already exists")
    e.execute("CREATE KEYSPACE IF NOT EXISTS ks1")
    // qualified DDL/DML from the default keyspace
    e.execute("CREATE TABLE ks1.t (k int PRIMARY KEY, v int)")
    e.execute("INSERT INTO ks1.t (k, v) VALUES (1, 10)")
    assert(rowsInOrder(e.execute("SELECT v FROM ks1.t")) === Seq(Seq(10)))
    // USE switches the unqualified namespace
    e.execute("USE ks1")
    assert(rowsInOrder(e.execute("SELECT v FROM t")) === Seq(Seq(10)))
    e.execute("CREATE TABLE t2 (k int PRIMARY KEY, v int)")
    e.execute("USE graft")
    assertInvalid(e, "SELECT * FROM t2", "unconfigured table")
    assert(e.execute("SELECT * FROM ks1.t2").count() === 0)
    // same bare name in two keyspaces stays distinct
    e.execute("CREATE TABLE t2 (k int PRIMARY KEY, w text)")
    e.execute("INSERT INTO t2 (k, w) VALUES (1, 'default')")
    assert(rowsInOrder(e.execute("SELECT w FROM t2")) === Seq(Seq("default")))
    // catalog introspection
    assert(rowsInOrder(e.execute("SELECT keyspace_name FROM system_schema.keyspaces"))
      .contains(Seq("ks1")))
    assert(rowsInOrder(e.execute(
      "SELECT table_name FROM system_schema.tables WHERE keyspace_name = 'ks1'"))
      .map(_.head).toSet === Set("t", "t2"))
    // DROP cascades the keyspace's tables and validates
    assertInvalid(e, "DROP KEYSPACE system", "Cannot drop system keyspace")
    e.execute("DROP KEYSPACE ks1")
    assertInvalid(e, "SELECT * FROM ks1.t", "unconfigured table")
    assertInvalid(e, "USE ks1", "does not exist")
    assertInvalid(e, "CREATE TABLE ks9.t (k int PRIMARY KEY)", "does not exist")
    e.execute("DROP KEYSPACE IF EXISTS ks1")
    // default-keyspace tables are untouched
    assert(rowsInOrder(e.execute("SELECT w FROM graft.t2")) === Seq(Seq("default")))
  }

  test("collection slice selection m[a..b], s[a..], s[..b]") {
    val e = mkEngine
    e.execute("CREATE TABLE sl1 (k int PRIMARY KEY, m map<int, text>, s set<int>)")
    e.execute("INSERT INTO sl1 (k, m, s) VALUES (1, {1: 'a', 5: 'b', 9: 'c'}, {2, 4, 6, 8})")
    val r = e.execute("SELECT m[2..8], s[4..], s[..5] FROM sl1").collect().head
    assert(r.getAs[Map[Int, String]](0) === Map(5 -> "b"))
    assert(r.getAs[scala.collection.Seq[Int]](1).toSeq === Seq(4, 6, 8))
    assert(r.getAs[scala.collection.Seq[Int]](2).toSeq === Seq(2, 4))
    // empty slice reads back null, like every CQL collection
    assert(e.execute("SELECT m[6..7] FROM sl1").collect().head.isNullAt(0))
  }

  test("CREATE FUNCTION: scalar SQL-expression body, null contract") {
    val e = mkEngine
    e.execute("CREATE TABLE f1 (k int PRIMARY KEY, v int)")
    e.execute("INSERT INTO f1 (k, v) VALUES (1, 6)")
    e.execute("INSERT INTO f1 (k, v) VALUES (2, null)")
    e.execute("CREATE FUNCTION double_it (x int) RETURNS NULL ON NULL INPUT " +
      "RETURNS int LANGUAGE spark AS 'x * 2'")
    assert(rowsInOrder(e.execute("SELECT k, double_it(v) FROM f1")) ===
      Seq(Seq(1, 12), Seq(2, null)))
    // CALLED ON NULL INPUT runs the body with the null
    e.execute("CREATE FUNCTION or_zero (x int) CALLED ON NULL INPUT " +
      "RETURNS int LANGUAGE spark AS 'coalesce(x, 0) + 1'")
    assert(rowsInOrder(e.execute("SELECT k, or_zero(v) FROM f1")) ===
      Seq(Seq(1, 7), Seq(2, 1)))
    assertInvalid(e, "SELECT double_it(v, v) FROM f1", "Invalid number of arguments")
  }

  test("CREATE FUNCTION LANGUAGE java: expression-shaped bodies translate; " +
    "larger bodies get the reference's compile-error text") {
    // bodies ported from the reference validation suite (UFTest.java,
    // AggregationTest.java) — the single-return shape every test UDF uses
    val e = mkEngine
    e.execute("CREATE TABLE jf1 (k int PRIMARY KEY, v int, d double, s text, " +
      "m map<text, int>, l list<int>)")
    e.execute("INSERT INTO jf1 (k, v, d, s, m, l) VALUES " +
      "(1, 6, 0.5, 'ab', {'x': 7}, [5, 9])")
    e.execute("INSERT INTO jf1 (k, v) VALUES (2, 2)")

    // identity + literals
    e.execute("CREATE FUNCTION jid (arg int) RETURNS NULL ON NULL INPUT " +
      "RETURNS int LANGUAGE java AS 'return arg;'")
    e.execute("CREATE FUNCTION jconst () CALLED ON NULL INPUT " +
      "RETURNS double LANGUAGE java AS 'return 10.0d;'")
    // boxing/unboxing + Math (UFTest 'sin' shape)
    e.execute("CREATE FUNCTION jsin (input double) RETURNS NULL ON NULL INPUT " +
      "RETURNS double LANGUAGE java AS " +
      "'return Double.valueOf(Math.sin(input.doubleValue()));'")
    // null-guard ternary fold state (AggregationTest's universal SFUNC)
    e.execute("CREATE FUNCTION jsum (a int, b int) CALLED ON NULL INPUT " +
      "RETURNS int LANGUAGE java AS " +
      "'return Integer.valueOf((a!=null?a.intValue():0) + b.intValue());'")
    // Java string concat: non-strings stringify, null prints "null"
    e.execute("CREATE FUNCTION jcat (a text, b int) CALLED ON NULL INPUT " +
      "RETURNS text LANGUAGE java AS $$return a + \"x\" + b + \"y\";$$")
    // toString + map/list element access
    e.execute("CREATE FUNCTION jts (a int) RETURNS NULL ON NULL INPUT " +
      "RETURNS text LANGUAGE java AS 'return a.toString();'")
    e.execute("CREATE FUNCTION jget (m map<text, int>, k text) RETURNS NULL ON NULL INPUT " +
      "RETURNS int LANGUAGE java AS 'return m.get(k);'")
    e.execute("CREATE FUNCTION jidx (l list<int>) RETURNS NULL ON NULL INPUT " +
      "RETURNS int LANGUAGE java AS 'return l.get(1);'")

    val r = e.execute("SELECT jid(v), jconst(), jsin(d), jsum(v, k), " +
      "jcat(s, v), jts(v), jget(m, 'x'), jidx(l) FROM jf1 WHERE k = 1").collect().head
    assert(r.getInt(0) === 6)
    assert(r.getDouble(1) === 10.0)
    assert(math.abs(r.getDouble(2) - math.sin(0.5)) < 1e-12)
    assert(r.getInt(3) === 7)   // 6 + 1
    assert(r.getString(4) === "abx6y")
    assert(r.getString(5) === "6")
    assert(r.getInt(6) === 7)
    assert(r.getInt(7) === 9)   // Java List.get is 0-based
    // CALLED ON NULL INPUT string concat prints "null" like Java
    val r2 = e.execute("SELECT jcat(s, v) FROM jf1 WHERE k = 2").collect().head
    assert(r2.getString(0) === "nullx2y")

    // Java semantics preserved through translation: int division
    // truncates BEFORE further arithmetic, Math.round is floor(x+0.5)
    // (differs from SQL round on negative halves), and the null-literal
    // guard works with null on either side
    e.execute("CREATE FUNCTION jdiv (a int, b int) RETURNS NULL ON NULL INPUT " +
      "RETURNS int LANGUAGE java AS 'return a / b * 2;'")
    e.execute("CREATE FUNCTION jround (x double) RETURNS NULL ON NULL INPUT " +
      "RETURNS bigint LANGUAGE java AS 'return Math.round(x);'")
    e.execute("CREATE FUNCTION jnullleft (a int) CALLED ON NULL INPUT " +
      "RETURNS int LANGUAGE java AS 'return null == a ? 0 : a.intValue();'")
    val sem = e.execute("SELECT jdiv(7, 2), jround(-2.5), jnullleft(null), jnullleft(4) " +
      "FROM jf1 WHERE k = 1").collect().head
    assert(sem.getInt(0) === 6, "Java (7/2)*2 truncates to 6")
    assert(sem.getLong(1) === -2L, "Java Math.round(-2.5) is -2")
    assert(sem.getInt(2) === 0 && sem.getInt(3) === 4)

    // LANGUAGE java SFUNC/FINALFUNC compose into CREATE AGGREGATE — the
    // reference AggregationTest's universal shape (null-guard ternary
    // state fold + stringifying finalfunc)
    e.execute("CREATE TABLE jag (k int, c int, v int, PRIMARY KEY (k, c))")
    for (c <- 1 to 4) e.execute(s"INSERT INTO jag (k, c, v) VALUES (1, $c, $c)")
    e.execute("CREATE FUNCTION jagg_state (a int, b int) CALLED ON NULL INPUT " +
      "RETURNS int LANGUAGE java AS " +
      "'return Integer.valueOf((a!=null?a.intValue():0) + b.intValue());'")
    e.execute("CREATE FUNCTION jagg_fin (a int) CALLED ON NULL INPUT " +
      "RETURNS text LANGUAGE java AS $$return \"fin\" + a;$$")
    e.execute("CREATE AGGREGATE jagg (int) SFUNC jagg_state STYPE int " +
      "FINALFUNC jagg_fin INITCOND null")
    val ar = e.execute("SELECT jagg(v) FROM jag").collect().head
    assert(ar.getString(0) === "fin10")

    // counted for-loops translate: the reference suite's own loop UDF
    // (UFTest.java:441 — StringBuilder repeat-append), plus a numeric fold
    e.execute("CREATE FUNCTION jrepeat (v text, n int) RETURNS NULL ON NULL INPUT " +
      "RETURNS text LANGUAGE java AS $$StringBuilder sb = new StringBuilder();\n" +
      "    for (int i = 0; i < n; i++)\n" +
      "        sb.append(v);\n" +
      "    return sb.toString();$$")
    e.execute("CREATE FUNCTION jtri (n int) RETURNS NULL ON NULL INPUT " +
      "RETURNS bigint LANGUAGE java AS " +
      "$$long s = 0; for (int i = 1; i <= n; i++) { s += i; } return s;$$")
    val lr = e.execute("SELECT jrepeat('a', 3), jrepeat('ab', 0), jtri(4), jtri(0) " +
      "FROM jf1 WHERE k = 1").collect().head
    assert(lr.getString(0) === "aaa", "UFTest.java:441: repeat('a', 3) = aaa")
    assert(lr.getString(1) === "", "zero iterations leave the builder empty")
    assert(lr.getLong(2) === 10L)
    assert(lr.getLong(3) === 0L)

    // beyond the statement surface → the reference's error text
    assertInvalid(e, "CREATE FUNCTION jloop (x int) CALLED ON NULL INPUT " +
      "RETURNS int LANGUAGE java AS 'int s = 0; while (s < x) s += 1; return s;'",
      "Could not compile function")
    assertInvalid(e, "CREATE FUNCTION jwho (x int) CALLED ON NULL INPUT " +
      "RETURNS int LANGUAGE java AS 'return y;'", "Could not compile function")
    assertInvalid(e, "CREATE FUNCTION jlang (x int) CALLED ON NULL INPUT " +
      "RETURNS int LANGUAGE javascript AS 'x'", "Unsupported language")
  }

  test("CREATE FUNCTION LANGUAGE java: statement bodies (locals, if/else) " +
    "execute and introspect with the original Java source") {
    val e = mkEngine
    e.execute("CREATE TABLE jst (k int PRIMARY KEY, v int, d double)")
    e.execute("INSERT INTO jst (k, v, d) VALUES (1, 7, 2.5)")

    // declared local feeding a branching body (UFTest statement style)
    e.execute("CREATE FUNCTION jclamp (x int, lo int, hi int) RETURNS NULL ON NULL INPUT " +
      "RETURNS int LANGUAGE java AS " +
      "$$int v = x; if (v < lo) return lo; if (v > hi) return hi; return v;$$")
    // declared-type conversion drives later arithmetic (double local)
    e.execute("CREATE FUNCTION jhalf (x int) RETURNS NULL ON NULL INPUT " +
      "RETURNS double LANGUAGE java AS $$double d = x; return d / 2;$$")
    // else-if chain with block scoping
    e.execute("CREATE FUNCTION jsgn (x int) RETURNS NULL ON NULL INPUT " +
      "RETURNS text LANGUAGE java AS " +
      "$$if (x > 0) { return \"pos\"; } else if (x < 0) { return \"neg\"; } else { return \"zero\"; }$$")
    // Math.min/max keep Java NaN propagation (not least/greatest)
    e.execute("CREATE FUNCTION jmin (a double, b double) CALLED ON NULL INPUT " +
      "RETURNS double LANGUAGE java AS 'return Math.min(a, b);'")

    val r = e.execute("SELECT jclamp(v, 0, 5), jclamp(v, 0, 10), jhalf(v), " +
      "jsgn(v), jsgn(0 - v), jsgn(0) FROM jst WHERE k = 1").collect().head
    assert(r.getInt(0) === 5)
    assert(r.getInt(1) === 7)
    assert(r.getDouble(2) === 3.5)
    assert(r.getString(3) === "pos")
    assert(r.getString(4) === "neg")
    assert(r.getString(5) === "zero")
    e.execute("CREATE FUNCTION jnan () CALLED ON NULL INPUT " +
      "RETURNS double LANGUAGE java AS 'return Math.sqrt(0.0 - 1.0);'")
    val nan = e.execute("SELECT jmin(d, jnan()), jmin(d, 1.0) FROM jst WHERE k = 1")
      .collect().head
    assert(nan.getDouble(0).isNaN, "Java Math.min propagates NaN")
    assert(nan.getDouble(1) === 1.0)

    // introspection returns what the client created — original language and
    // Java source, not the translated Spark SQL (SystemKeyspace behavior)
    val row = e.execute("SELECT language, body FROM system_schema.functions " +
      "WHERE keyspace_name = 'graft' AND function_name = 'jhalf'").collect().head
    assert(row.getString(0) === "java")
    assert(row.getString(1) === "double d = x; return d / 2;")

    // assignment keeps the reference-style rejection
    assertInvalid(e, "CREATE FUNCTION jassign (x int) CALLED ON NULL INPUT " +
      "RETURNS int LANGUAGE java AS 'int y = 0; y = x; return y;'",
      "Could not compile function")
  }

  test("CREATE AGGREGATE: SFUNC fold + FINALFUNC + INITCOND") {
    val e = mkEngine
    e.execute("CREATE TABLE ag1 (k int, c int, v int, PRIMARY KEY (k, c))")
    for (c <- 1 to 4) e.execute(s"INSERT INTO ag1 (k, c, v) VALUES (1, $c, $c)")
    e.execute("CREATE FUNCTION sum_sq_state (st bigint, val int) CALLED ON NULL INPUT " +
      "RETURNS bigint LANGUAGE spark AS 'st + val * val'")
    e.execute("CREATE AGGREGATE sum_sq (int) SFUNC sum_sq_state STYPE bigint INITCOND 0")
    // 1 + 4 + 9 + 16
    assert(rowsInOrder(e.execute("SELECT sum_sq(v) FROM ag1")) === Seq(Seq(30L)))
    // with FINALFUNC and per-group fold
    e.execute("CREATE FUNCTION halve (st bigint) CALLED ON NULL INPUT " +
      "RETURNS double LANGUAGE spark AS 'st / 2.0'")
    e.execute("CREATE AGGREGATE half_sum_sq (int) SFUNC sum_sq_state STYPE bigint " +
      "FINALFUNC halve INITCOND 0")
    assert(rowsInOrder(e.execute("SELECT half_sum_sq(v) FROM ag1")) === Seq(Seq(15.0)))
    assert(rowsInOrder(e.execute("SELECT k, sum_sq(v) FROM ag1 GROUP BY k")) ===
      Seq(Seq(1, 30L)))
    assertInvalid(e, "CREATE AGGREGATE bad (int) SFUNC nope STYPE bigint", "Unknown SFUNC")
  }

  test("UDA folds in clustering order (non-commutative SFUNC)") {
    val e = mkEngine
    e.execute("CREATE TABLE ag2 (k int, c int, v text, PRIMARY KEY (k, c)) " +
      "WITH CLUSTERING ORDER BY (c DESC)")
    // insert out of clustering order on purpose
    e.execute("INSERT INTO ag2 (k, c, v) VALUES (1, 2, 'b')")
    e.execute("INSERT INTO ag2 (k, c, v) VALUES (1, 3, 'a')")
    e.execute("INSERT INTO ag2 (k, c, v) VALUES (1, 1, 'c')")
    e.execute("CREATE FUNCTION cat_state (st text, val text) CALLED ON NULL INPUT " +
      "RETURNS text LANGUAGE spark AS 'concat(st, val)'")
    e.execute("CREATE AGGREGATE cat_all (text) SFUNC cat_state STYPE text INITCOND ''")
    // fold order = selection order: this table clusters c DESC, so the
    // fold sees c=3 ('a') first
    assert(rowsInOrder(e.execute("SELECT cat_all(v) FROM ag2")) === Seq(Seq("abc")))
    // an ASC table folds ascending
    e.execute("CREATE TABLE ag3 (k int, c int, v text, PRIMARY KEY (k, c))")
    e.execute("INSERT INTO ag3 (k, c, v) VALUES (1, 2, 'y')")
    e.execute("INSERT INTO ag3 (k, c, v) VALUES (1, 1, 'x')")
    assert(rowsInOrder(e.execute("SELECT cat_all(v) FROM ag3")) === Seq(Seq("xy")))
    // mixed aggregate + plain column: "first row" honors DESC clustering
    assert(rowsInOrder(e.execute("SELECT v, count(*) FROM ag2")) === Seq(Seq("a", 3L)))
    assert(rowsInOrder(e.execute("SELECT v, count(*) FROM ag3")) === Seq(Seq("x", 2L)))
  }

  test("DROP TYPE: still-in-use checks, nested references, IF EXISTS " +
    "(DropTypeStatement.java:58-110; entities/UserTypesTest.java shapes)") {
    val e = mkEngine
    e.execute("CREATE TYPE dt_addr (street text, zip int)")
    e.execute("CREATE TYPE dt_person (name text, home dt_addr)")
    e.execute("CREATE TABLE dt_tbl (k int PRIMARY KEY, p dt_person)")
    // dt_person referenced directly by the table; dt_addr nested through it
    assertInvalid(e, "DROP TYPE dt_person", "still used by tables dt_tbl")
    assertInvalid(e, "DROP TYPE dt_addr", "still used by user types graft.dt_person")
    // functions are checked before types/tables, like the reference
    e.execute("CREATE FUNCTION dt_fn (a dt_addr) CALLED ON NULL INPUT " +
      "RETURNS int LANGUAGE spark AS 'a.zip'")
    assertInvalid(e, "DROP TYPE dt_addr", "still used by functions graft.dt_fn")
    e.execute("DROP FUNCTION dt_fn")
    e.execute("DROP TABLE dt_tbl")
    e.execute("DROP TYPE dt_person")
    e.execute("DROP TYPE dt_addr")
    assertInvalid(e, "DROP TYPE dt_addr", "doesn't exist")
    e.execute("DROP TYPE IF EXISTS dt_addr")
    // the name is free again after the drop
    e.execute("CREATE TYPE dt_addr (a int)")
  }

  test("DROP FUNCTION / DROP AGGREGATE: aggregate dependency + signature " +
    "checks (DropFunctionStatement.java:66-120, DropAggregateStatement.java:68-115)") {
    val e = mkEngine
    e.execute("CREATE FUNCTION df_add (state bigint, v bigint) CALLED ON NULL INPUT " +
      "RETURNS bigint LANGUAGE spark AS 'state + v'")
    e.execute("CREATE AGGREGATE df_sum (bigint) SFUNC df_add STYPE bigint INITCOND 0")
    assertInvalid(e, "DROP FUNCTION df_add", "still referenced by aggregates graft.df_sum")
    // a mismatched explicit signature is "doesn't exist", not a drop
    assertInvalid(e, "DROP FUNCTION df_add (int, int)", "doesn't exist")
    assertInvalid(e, "DROP AGGREGATE df_sum (text)", "doesn't exist")
    e.execute("DROP AGGREGATE df_sum (bigint)")
    e.execute("DROP FUNCTION df_add (bigint, bigint)")
    assertInvalid(e, "DROP AGGREGATE df_sum", "doesn't exist")
    assertInvalid(e, "DROP FUNCTION df_add", "doesn't exist")
    e.execute("DROP FUNCTION IF EXISTS df_add")
    e.execute("DROP AGGREGATE IF EXISTS df_sum")
    // the name is free again after the drop (different signature is fine)
    e.execute("CREATE FUNCTION df_add (a int, b int) CALLED ON NULL INPUT " +
      "RETURNS int LANGUAGE spark AS 'a + b'")
  }

  test("ALTER MATERIALIZED VIEW: param validation (AlterViewStatement.java:44-75)") {
    val e = mkEngine
    e.execute("CREATE TABLE amv_base (k int, c int, v int, PRIMARY KEY (k, c))")
    e.execute("CREATE MATERIALIZED VIEW amv_v AS SELECT k, c, v FROM amv_base " +
      "WHERE k IS NOT NULL AND c IS NOT NULL PRIMARY KEY (c, k)")
    e.execute("ALTER MATERIALIZED VIEW amv_v WITH gc_grace_seconds = 864000 AND comment = 'x'")
    assertInvalid(e, "ALTER MATERIALIZED VIEW amv_v WITH gc_grace_seconds = 0",
      "Cannot alter gc_grace_seconds of a materialized view to 0")
    assertInvalid(e, "ALTER MATERIALIZED VIEW amv_v WITH default_time_to_live = 300",
      "Cannot set or alter default_time_to_live for a materialized view")
    // dttl = 0 is the reference's "unset" and passes validation
    e.execute("ALTER MATERIALIZED VIEW amv_v WITH default_time_to_live = 0")
    assertInvalid(e, "ALTER MATERIALIZED VIEW amv_nope WITH gc_grace_seconds = 1",
      "doesn't exist")
    // the altered view still serves reads
    e.execute("INSERT INTO amv_base (k, c, v) VALUES (1, 2, 3)")
    assert(rowsInOrder(e.execute("SELECT c, k, v FROM amv_v")) === Seq(Seq(2, 1, 3)))
  }

  test("unknown table params are rejected, not stored " +
    "(PropertyDefinitions.java:58; TableParams.Option set)") {
    val e = mkEngine
    e.execute("CREATE TABLE up_base (k int, c int, v int, PRIMARY KEY (k, c))")
    e.execute("CREATE MATERIALIZED VIEW up_v AS SELECT k, c, v FROM up_base " +
      "WHERE k IS NOT NULL AND c IS NOT NULL PRIMARY KEY (c, k)")
    // a typo'd param name must fail on every WITH surface (ADVICE r6)
    assertInvalid(e, "ALTER MATERIALIZED VIEW up_v WITH gc_graceseconds = 1",
      "Unknown property 'gc_graceseconds'")
    assertInvalid(e, "ALTER TABLE up_base WITH gc_graceseconds = 1",
      "Unknown property 'gc_graceseconds'")
    assertInvalid(e, "CREATE TABLE up_bad (k int PRIMARY KEY) WITH read_repairs = 'x'",
      "Unknown property 'read_repairs'")
    // WITH ID = <uuid> is valid (TableAttributes.java:41-51 adds ID on
    // top of the TableParams.Option set; parsed and ignored here)
    e.execute("CREATE TABLE up_id (k int PRIMARY KEY) " +
      "WITH id = '5a1c395e-b41f-11e5-9f22-ba0be0483c18'")
    // every reference TableParams.Option name still parses
    e.execute("ALTER TABLE up_base WITH bloom_filter_fp_chance = 0.01 " +
      "AND caching = {'keys': 'ALL'} AND comment = 'c' AND crc_check_chance = 1.0 " +
      "AND max_index_interval = 2048 AND memtable_flush_period_in_ms = 0 " +
      "AND min_index_interval = 128 AND speculative_retry = '99p' " +
      "AND additional_write_policy = '99p' AND cdc = false AND read_repair = 'BLOCKING'")
  }

  test("DROP TYPE/FUNCTION/AGGREGATE accept keyspace-qualified names " +
    "(Parser.g userTypeName/functionName; unqualified registries resolve " +
    "the bare part after keyspace validation)") {
    val e = mkEngine
    e.execute("CREATE TYPE dq_t (x int)")
    e.execute("CREATE FUNCTION dq_f (a int, b int) CALLED ON NULL INPUT " +
      "RETURNS int LANGUAGE spark AS 'a + b'")
    e.execute("CREATE AGGREGATE dq_a (int) SFUNC dq_f STYPE int INITCOND 0")
    // an unknown keyspace is rejected before name resolution
    assertInvalid(e, "DROP TYPE nosuchks.dq_t", "Keyspace 'nosuchks' does not exist")
    assertInvalid(e, "DROP FUNCTION nosuchks.dq_f", "Keyspace 'nosuchks' does not exist")
    assertInvalid(e, "DROP AGGREGATE nosuchks.dq_a", "Keyspace 'nosuchks' does not exist")
    // a missing name reports the keyspace it was addressed under
    assertInvalid(e, "DROP TYPE graft.dq_nope", "Type 'graft.dq_nope' doesn't exist")
    // qualified drops resolve and apply
    e.execute("DROP AGGREGATE graft.dq_a (int)")
    e.execute("DROP FUNCTION graft.dq_f")
    e.execute("DROP TYPE graft.dq_t")
    assertInvalid(e, "DROP TYPE dq_t", "doesn't exist")
  }

  test("types, functions and aggregates are per-keyspace: the same bare " +
    "name lives independently in two keyspaces (SchemaKeyspace types/" +
    "functions/aggregates are keyspace-keyed)") {
    val e = mkEngine
    e.execute("CREATE KEYSPACE ns1 WITH replication = {'class': 'SimpleStrategy', 'replication_factor': 1}")
    e.execute("CREATE KEYSPACE ns2 WITH replication = {'class': 'SimpleStrategy', 'replication_factor': 1}")
    // same-named TYPE with different shapes in each keyspace
    e.execute("USE ns1")
    e.execute("CREATE TYPE pt (a int)")
    e.execute("CREATE TABLE t1 (k int PRIMARY KEY, v pt)")
    e.execute("USE ns2")
    e.execute("CREATE TYPE pt (a text, b text)")
    e.execute("CREATE TABLE t2 (k int PRIMARY KEY, v pt)")
    // each table resolved ITS keyspace's type
    e.execute("INSERT INTO ns1.t1 (k, v) VALUES (1, {a: 7})")
    e.execute("INSERT INTO t2 (k, v) VALUES (1, {a: 'x', b: 'y'})")
    assert(e.execute("SELECT v.a FROM ns1.t1 WHERE k = 1").collect()(0).get(0) === 7)
    assert(e.execute("SELECT v.b FROM ns2.t2 WHERE k = 1").collect()(0).getString(0) === "y")
    // same-named FUNCTION with different bodies per keyspace
    e.execute("USE ns1")
    e.execute("CREATE FUNCTION pf (a int) CALLED ON NULL INPUT RETURNS int LANGUAGE spark AS 'a * 2'")
    e.execute("USE ns2")
    e.execute("CREATE FUNCTION pf (a int) CALLED ON NULL INPUT RETURNS int LANGUAGE spark AS 'a * 10'")
    assert(e.execute("SELECT pf(k) FROM t2 WHERE k = 1").collect()(0).getInt(0) === 10)
    assert(e.execute("SELECT ns1.pf(k) FROM t2 WHERE k = 1").collect()(0).getInt(0) === 2)
    // dropping ns1's copy leaves ns2's intact
    e.execute("DROP FUNCTION ns1.pf")
    assert(e.execute("SELECT pf(k) FROM t2 WHERE k = 1").collect()(0).getInt(0) === 10)
    // an AGGREGATE resolves its SFUNC in its own keyspace
    e.execute("CREATE FUNCTION pag (acc int, x int) CALLED ON NULL INPUT " +
      "RETURNS int LANGUAGE spark AS 'acc + x'")
    e.execute("CREATE AGGREGATE pa (int) SFUNC pag STYPE int INITCOND 0")
    assert(e.execute("SELECT pa(k) FROM t2").collect()(0).getInt(0) === 1)
    // the same aggregate name registers independently in ns1
    e.execute("USE ns1")
    e.execute("CREATE FUNCTION pag (acc int, x int) CALLED ON NULL INPUT " +
      "RETURNS int LANGUAGE spark AS 'acc + 2 * x'")
    e.execute("CREATE AGGREGATE pa (int) SFUNC pag STYPE int INITCOND 0")
    assert(e.execute("SELECT pa(k) FROM t1").collect()(0).getInt(0) === 2)
  }

  test("user types are keyspace-local: a table cannot embed another " +
    "keyspace's type (CQL3Type.java:753-762, CASSANDRA-6643)") {
    val e = mkEngine
    e.execute("CREATE KEYSPACE xk1 WITH replication = {'class': 'SimpleStrategy', 'replication_factor': 1}")
    e.execute("CREATE KEYSPACE xk2 WITH replication = {'class': 'SimpleStrategy', 'replication_factor': 1}")
    e.execute("USE xk1")
    e.execute("CREATE TYPE xt (a int)")
    e.execute("USE xk2")
    assertInvalid(e, "CREATE TABLE bad (k int PRIMARY KEY, v xk1.xt)",
      "cannot refer to a user type in keyspace xk1")
    // nested through a collection too
    assertInvalid(e, "CREATE TABLE bad2 (k int PRIMARY KEY, v list<frozen<xk1.xt>>)",
      "cannot refer to a user type in keyspace xk1")
    // a type of xk2 cannot embed xk1's type either
    assertInvalid(e, "CREATE TYPE xt2 (f frozen<xk1.xt>)",
      "cannot refer to a user type in keyspace xk1")
    // same-keyspace use stays fine
    e.execute("USE xk1")
    e.execute("CREATE TABLE ok (k int PRIMARY KEY, v xt)")
  }

  test("DROP ... IF EXISTS with an unknown keyspace is a no-op, not an error") {
    // DropTypeStatement/DropFunctionStatement.apply: missing keyspace under
    // IF EXISTS returns the schema unchanged
    val e = mkEngine
    e.execute("DROP TYPE IF EXISTS nosuchks.t")
    e.execute("DROP FUNCTION IF EXISTS nosuchks.f")
    e.execute("DROP AGGREGATE IF EXISTS nosuchks.agg")
    // without IF EXISTS the unknown keyspace still errors
    assertInvalid(e, "DROP TYPE nosuchks.t", "does not exist")
  }

  test("CREATE AGGREGATE with multiple arguments folds every argument " +
    "column through one SFUNC call (CreateAggregateStatement.java:110-115)") {
    val e = mkEngine
    e.execute("CREATE TABLE ma_t (k int, c int, w text, x int, PRIMARY KEY (k, c))")
    e.execute("INSERT INTO ma_t (k, c, w, x) VALUES (1, 1, 'a', 10)")
    e.execute("INSERT INTO ma_t (k, c, w, x) VALUES (1, 2, 'b', 20)")
    e.execute("INSERT INTO ma_t (k, c, w, x) VALUES (1, 3, null, 30)")
    // state function = state prepended to the aggregate's argument list
    e.execute("CREATE FUNCTION ma_sf (st text, w text, x int) " +
      "RETURNS NULL ON NULL INPUT RETURNS text LANGUAGE spark " +
      "AS 'concat(st, w, x)'")
    e.execute("CREATE AGGREGATE ma_agg (text, int) SFUNC ma_sf STYPE text INITCOND ''")
    // clustering-order fold; the null-w row is skipped whole (RETURNS NULL
    // ON NULL INPUT sfunc: a null in ANY argument leaves the state as-is)
    assert(rowsInOrder(e.execute("SELECT ma_agg(w, x) FROM ma_t WHERE k = 1"))
      === Seq(Seq("a10b20")))
    // introspection carries the full signature
    val agr = e.execute("SELECT argument_types, state_func FROM system_schema.aggregates " +
      "WHERE keyspace_name = 'graft' AND aggregate_name = 'ma_agg'").collect().head
    assert(agr.getSeq[String](0) === Seq("text", "int"))
    // arity is validated at create (SFUNC must take state + each arg)...
    assertInvalid(e, "CREATE AGGREGATE ma_bad (text) SFUNC ma_sf STYPE text",
      "must take (state, text) arguments")
    // ...and at call: wrong arity, then wrong column type (exact-match
    // resolution, FunctionResolver.java:163 — no implicit widening)
    assertInvalid(e, "SELECT ma_agg(w) FROM ma_t WHERE k = 1",
      "Invalid number of arguments")
    assertInvalid(e, "SELECT ma_agg(w, w) FROM ma_t WHERE k = 1",
      "none of its type signatures match")
    // aggregation of aggregation is rejected with the reference's text
    // (AbstractFunctionSelector.java:52); arithmetic OVER aggregates stays
    // legal
    assertInvalid(e, "SELECT sum(max(x)) FROM ma_t WHERE k = 1",
      "aggregate functions cannot be used as arguments of aggregate functions")
    assertInvalid(e, "SELECT count(ma_agg(w, x)) FROM ma_t WHERE k = 1",
      "aggregate functions cannot be used as arguments")
    assert(rowsInOrder(e.execute("SELECT max(x) - min(x) FROM ma_t WHERE k = 1"))
      === Seq(Seq(20)))
  }

  test("peers_v2 and built_views serve driver-connect introspection " +
    "(SystemKeyspace.java PeersV2/BuiltViews)") {
    val e = mkEngine
    // single-node ring: peers_v2 exists and is empty (4.x drivers query it
    // before falling back to the deprecated peers)
    assert(e.execute("SELECT peer, peer_port FROM system.peers_v2").collect().isEmpty)
    // built_views reflects the live registry; derivation-based MVs are
    // built the moment they exist
    e.execute("CREATE TABLE bv_base (k int, c text, PRIMARY KEY (k))")
    e.execute("CREATE MATERIALIZED VIEW bv_mv AS SELECT c, k FROM bv_base " +
      "WHERE c IS NOT NULL AND k IS NOT NULL PRIMARY KEY (c, k)")
    assert(rowsInOrder(e.execute(
      "SELECT keyspace_name, view_name, status_replicated FROM system.built_views"))
      === Seq(Seq("graft", "bv_mv", true)))
  }

  test("system_virtual_schema describes the virtual registry keyspaces " +
    "(VirtualSchemaKeyspace.java — drivers discover virtual tables here)") {
    val e = mkEngine
    // only the registry keyspaces appear, like VirtualKeyspaceRegistry:
    // system/system_schema are node-local tables, not registry entries
    assert(rowsInOrder(e.execute(
      "SELECT keyspace_name FROM system_virtual_schema.keyspaces"))
      === Seq(Seq("system_views"), Seq("system_virtual_schema")))
    val tbls = rowsInOrder(e.execute(
      "SELECT keyspace_name, table_name, comment FROM system_virtual_schema.tables"))
    assert(tbls.contains(Seq("system_views", "settings", "current settings")))
    assert(tbls.contains(Seq("system_views", "clients", "currently connected clients")))
    assert(tbls.contains(Seq("system_virtual_schema", "columns", "virtual column definitions")))
    assert(!tbls.exists(_.head == "system_schema"))
    // exact reference row shape for a known column (clients.port is the
    // first clustering column, int, ascending)
    val col = rowsInOrder(e.execute(
      "SELECT clustering_order, kind, position, type FROM system_virtual_schema.columns " +
        "WHERE keyspace_name = 'system_views' AND table_name = 'clients' " +
        "AND column_name = 'port'"))
    assert(col === Seq(Seq("asc", "clustering", 0, "int")))
    val pk = rowsInOrder(e.execute(
      "SELECT clustering_order, kind, position FROM system_virtual_schema.columns " +
        "WHERE keyspace_name = 'system_views' AND table_name = 'settings' " +
        "AND column_name = 'name'"))
    assert(pk === Seq(Seq("none", "partition_key", 0)))
  }

  test("size_estimates answers from cache until a table's data changes " +
    "(split-planning clients poll it — must not rescan cold tables)") {
    val e = mkEngine
    (1 to 5).foreach { i =>
      e.execute(s"CREATE TABLE vt_se_$i (k int PRIMARY KEY, v int)")
      e.execute(s"INSERT INTO vt_se_$i (k, v) VALUES (1, 1)")
    }
    def parts(t: String): Long = e.execute(
      "SELECT partitions_count FROM system.size_estimates " +
        s"WHERE keyspace_name = 'graft' AND table_name = '$t'")
      .collect().head.getLong(0)
    val jobCount = new java.util.concurrent.atomic.AtomicInteger
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobCount.incrementAndGet()
    }
    // the listener bus delivers asynchronously; settle before sampling
    def settledJobs(): Int = { Thread.sleep(800); jobCount.get() }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(parts("vt_se_1") === 1L) // cold: scans all five tables
      val afterCold = settledJobs()
      assert(parts("vt_se_1") === 1L) // warm: zero per-table scan jobs
      val afterWarm = settledJobs()
      val warmDelta = afterWarm - afterCold
      val coldDelta = afterCold
      assert(warmDelta <= coldDelta - 4,
        s"warm size_estimates read re-scanned tables: cold=$coldDelta jobs, warm=$warmDelta")
      // a mutation moves only that table's generation: the next read
      // recomputes vt_se_2 and sees the new partition, others stay cached
      e.execute("INSERT INTO vt_se_2 (k, v) VALUES (2, 2)")
      assert(parts("vt_se_2") === 2L)
      assert(parts("vt_se_1") === 1L)
      // TRUNCATE invalidates too
      e.execute("TRUNCATE vt_se_3")
      assert(parts("vt_se_3") === 0L)
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
