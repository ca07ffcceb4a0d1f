package graft

import graft.cql.CqlEngine

/** Secondary-index DDL surface: CREATE [CUSTOM] INDEX with map targets
  * keys()/values()/entries()/full(), DROP INDEX, naming, duplicates, and
  * which restrictions each target kind serves without ALLOW FILTERING.
  *
  * Shapes mined from the reference's
  * test/unit/.../entities/SecondaryIndexOnMapEntriesTest.java and
  * SecondaryIndexTest.java; validation messages follow
  * statements/schema/CreateIndexStatement.java:90-190.
  */
class CqlIndexSpec extends SparkSpec {

  def mkEngine: CqlEngine = new CqlEngine(spark)

  def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  def assertInvalid(e: CqlEngine, cql: String, msgPart: String): Unit = {
    val ex = intercept[RuntimeException](e.execute(cql).collect())
    assert(ex.getMessage.contains(msgPart), s"got: ${ex.getMessage}")
  }

  test("entries() index serves map-entry EQ without ALLOW FILTERING") {
    val e = mkEngine
    e.execute("CREATE TABLE mi1 (k text PRIMARY KEY, v map<text, int>)")
    e.execute("INSERT INTO mi1 (k, v) VALUES ('foo', {'a': 1, 'c': 3})")
    e.execute("INSERT INTO mi1 (k, v) VALUES ('bar', {'a': 1, 'b': 2})")
    e.execute("INSERT INTO mi1 (k, v) VALUES ('baz', {'b': 2, 'c': 5, 'd': 4})")
    e.execute("INSERT INTO mi1 (k, v) VALUES ('qux', {'b': 2, 'd': 4})")
    // without the index: filtering required
    assertInvalid(e, "SELECT k FROM mi1 WHERE v['a'] = 1", "ALLOW FILTERING")
    e.execute("CREATE INDEX ON mi1 (entries(v))")
    // SecondaryIndexOnMapEntriesTest.testShouldFindRowsMatchingSingleEqualityRestriction
    assert(rows(e.execute("SELECT k FROM mi1 WHERE v['a'] = 1")) ===
      Set(Seq("foo"), Seq("bar")))
    assert(rows(e.execute("SELECT k FROM mi1 WHERE v['b'] = 2")) ===
      Set(Seq("bar"), Seq("baz"), Seq("qux")))
    assert(rows(e.execute("SELECT k FROM mi1 WHERE v['c'] = 3")) === Set(Seq("foo")))
    assert(rows(e.execute("SELECT k FROM mi1 WHERE v['c'] = 5")) === Set(Seq("baz")))
    // testRequireFilteringDirectiveIfMultipleRestrictionsSpecified: the
    // single index serves ONE restriction; a second needs filtering
    assertInvalid(e,
      "SELECT k FROM mi1 WHERE v['b'] = 2 AND v['d'] = 4", "ALLOW FILTERING")
    assert(rows(e.execute(
      "SELECT k FROM mi1 WHERE v['b'] = 2 AND v['d'] = 4 ALLOW FILTERING")) ===
      Set(Seq("baz"), Seq("qux")))
  }

  test("keys()/values() indexes serve CONTAINS KEY / CONTAINS") {
    val e = mkEngine
    e.execute("CREATE TABLE mi2 (k int PRIMARY KEY, m map<text, int>, l list<int>)")
    e.execute("INSERT INTO mi2 (k, m, l) VALUES (1, {'x': 1}, [1, 2])")
    e.execute("INSERT INTO mi2 (k, m, l) VALUES (2, {'y': 2}, [2, 3])")
    assertInvalid(e, "SELECT k FROM mi2 WHERE m CONTAINS KEY 'x'", "ALLOW FILTERING")
    assertInvalid(e, "SELECT k FROM mi2 WHERE l CONTAINS 3", "ALLOW FILTERING")
    e.execute("CREATE INDEX ON mi2 (keys(m))")
    // a plain CREATE INDEX on a collection is a values() index
    // (IndexTarget.Raw.prepare corrects SIMPLE → VALUES)
    e.execute("CREATE INDEX ON mi2 (l)")
    assert(rows(e.execute("SELECT k FROM mi2 WHERE m CONTAINS KEY 'x'")) === Set(Seq(1)))
    assert(rows(e.execute("SELECT k FROM mi2 WHERE l CONTAINS 3")) === Set(Seq(2)))
    // keys() does not serve CONTAINS (value side): still filtering
    assertInvalid(e, "SELECT k FROM mi2 WHERE m CONTAINS 2", "ALLOW FILTERING")
    e.execute("CREATE INDEX ON mi2 (values(m))")
    assert(rows(e.execute("SELECT k FROM mi2 WHERE m CONTAINS 2")) === Set(Seq(2)))
  }

  test("full() index serves whole-collection EQ") {
    val e = mkEngine
    e.execute("CREATE TABLE mi3 (k int PRIMARY KEY, l frozen<list<int>>)")
    e.execute("INSERT INTO mi3 (k, l) VALUES (1, [1, 2])")
    e.execute("INSERT INTO mi3 (k, l) VALUES (2, [3])")
    assertInvalid(e, "SELECT k FROM mi3 WHERE l = [1, 2]", "ALLOW FILTERING")
    e.execute("CREATE INDEX ON mi3 (full(l))")
    assert(rows(e.execute("SELECT k FROM mi3 WHERE l = [1, 2]")) === Set(Seq(1)))
  }

  test("an indexed clustering column is queryable without the partition key") {
    val e = mkEngine
    e.execute("CREATE TABLE mi4 (a int, b int, v int, PRIMARY KEY (a, b))")
    for (a <- 0 until 3; b <- 0 until 3)
      e.execute(s"INSERT INTO mi4 (a, b, v) VALUES ($a, $b, ${a * 10 + b})")
    assertInvalid(e, "SELECT v FROM mi4 WHERE b = 1", "ALLOW FILTERING")
    e.execute("CREATE INDEX ON mi4 (b)")
    assert(rows(e.execute("SELECT v FROM mi4 WHERE b = 1")) ===
      Set(Seq(1), Seq(11), Seq(21)))
  }

  test("CREATE INDEX validation follows CreateIndexStatement") {
    val e = mkEngine
    e.execute("CREATE TABLE mi5 (k int PRIMARY KEY, v int, d duration, " +
      "m map<text, duration>, s set<text>)")
    // only partition key column (CreateIndexStatement.java:175)
    assertInvalid(e, "CREATE INDEX ON mi5 (k)",
      "Cannot create secondary index on the only partition key column")
    // durations (:163-171)
    assertInvalid(e, "CREATE INDEX ON mi5 (d)",
      "not supported on duration columns")
    assertInvalid(e, "CREATE INDEX ON mi5 (values(m))",
      "collections containing durations")
    // target-kind / column-type mismatches (:184-187)
    assertInvalid(e, "CREATE INDEX ON mi5 (keys(s))", "non-map type")
    assertInvalid(e, "CREATE INDEX ON mi5 (entries(s))", "non-map type")
    assertInvalid(e, "CREATE INDEX ON mi5 (values(v))",
      "Non-collection columns only support simple indexes")
    assertInvalid(e, "CREATE INDEX ON mi5 (full(v))",
      "can only be created on frozen collections")
    // counter tables (:94)
    e.execute("CREATE TABLE mi5c (k int PRIMARY KEY, c counter)")
    assertInvalid(e, "CREATE INDEX ON mi5c (c)",
      "counter tables aren't supported")
    // custom without a class / class on a non-custom index
    assertInvalid(e, "CREATE CUSTOM INDEX ON mi5 (v)",
      "requires specifying the index class")
    assertInvalid(e, "CREATE INDEX ON mi5 (v) USING 'SomeClass'",
      "Cannot specify index class for a non-CUSTOM index")
    // a composite-pk COMPONENT is indexable (only the sole pk column isn't)
    e.execute("CREATE TABLE mi5p (a int, b int, v int, PRIMARY KEY ((a, b)))")
    e.execute("CREATE INDEX ON mi5p (a)")
  }

  test("index naming, duplicates, IF NOT EXISTS, and DROP INDEX") {
    val e = mkEngine
    e.execute("CREATE TABLE mi6 (k int PRIMARY KEY, v int, w int)")
    e.execute("CREATE INDEX ON mi6 (v)")           // generated: mi6_v_idx
    // same name again
    assertInvalid(e, "CREATE INDEX mi6_v_idx ON mi6 (w)", "already exists")
    e.execute("CREATE INDEX IF NOT EXISTS mi6_v_idx ON mi6 (w)") // no-op
    // duplicate target under a different name (:128-135)
    assertInvalid(e, "CREATE INDEX other_name ON mi6 (v)",
      "is a duplicate of existing index mi6_v_idx")
    e.execute("CREATE INDEX IF NOT EXISTS other_name ON mi6 (v)") // no-op
    // drop restores the filtering requirement
    e.execute("INSERT INTO mi6 (k, v, w) VALUES (1, 10, 100)")
    assert(rows(e.execute("SELECT k FROM mi6 WHERE v = 10")) === Set(Seq(1)))
    e.execute("DROP INDEX mi6_v_idx")
    assertInvalid(e, "SELECT k FROM mi6 WHERE v = 10", "ALLOW FILTERING")
    assertInvalid(e, "DROP INDEX mi6_v_idx", "could not be found")
    e.execute("DROP INDEX IF EXISTS mi6_v_idx") // no-op
  }

  test("system_schema.indexes lists definitions with target and class options") {
    val e = mkEngine
    e.execute("CREATE TABLE mi7 (k int PRIMARY KEY, v text, m map<text, int>)")
    e.execute("CREATE INDEX ON mi7 (entries(m))")
    e.execute("CREATE CUSTOM INDEX mi7_sasi ON mi7 (v) " +
      "USING 'org.apache.cassandra.index.sasi.SASIIndex' " +
      "WITH OPTIONS = {'mode': 'CONTAINS', 'case_sensitive': 'false'}")
    val got = e.execute(
      "SELECT index_name, kind, options FROM system_schema.indexes")
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getMap[String, String](2).toMap)).toSet
    assert(got === Set(
      ("mi7_m_idx", "COMPOSITES", Map("target" -> "entries(m)")),
      ("mi7_sasi", "CUSTOM", Map(
        "target" -> "v",
        "class_name" -> "org.apache.cassandra.index.sasi.SASIIndex",
        "mode" -> "CONTAINS", "case_sensitive" -> "false"))))
    // dropping the table drops its indexes
    e.execute("DROP TABLE mi7")
    assert(e.execute("SELECT index_name FROM system_schema.indexes").count() === 0)
  }

  test("SASI mode gates LIKE serving: PREFIX default vs CONTAINS " +
    "(sasi/conf/IndexMode.java, OnDiskIndexBuilder.Mode; SASIIndexTest.java:1806-1846,2146-2196)") {
    val e = mkEngine
    e.execute("CREATE TABLE sm1 (k int PRIMARY KEY, v text)")
    e.execute("INSERT INTO sm1 (k, v) VALUES (1, 'Pavel')")
    e.execute("INSERT INTO sm1 (k, v) VALUES (2, 'Jordan')")
    // default mode is PREFIX: 'x%' and exact-term match served...
    e.execute("CREATE CUSTOM INDEX sm1_pref ON sm1 (v) " +
      "USING 'org.apache.cassandra.index.sasi.SASIIndex'")
    assert(rows(e.execute("SELECT k FROM sm1 WHERE v LIKE 'Pav%'")) === Set(Seq(1)))
    assert(rows(e.execute("SELECT k FROM sm1 WHERE v LIKE 'Pavel'")) === Set(Seq(1)))
    // ...but suffix/contains are a hard error, even with ALLOW FILTERING
    // (SASIIndexTest.java:1824-1831: '%U' on a prefix-mode index)
    assertInvalid(e, "SELECT k FROM sm1 WHERE v LIKE '%vel'", "only supported")
    assertInvalid(e, "SELECT k FROM sm1 WHERE v LIKE '%vel' ALLOW FILTERING", "only supported")
    assertInvalid(e, "SELECT k FROM sm1 WHERE v LIKE '%ave%'", "only supported")
    // empty term after trimming wildcards (SingleColumnRestriction.java:771)
    assertInvalid(e, "SELECT k FROM sm1 WHERE v LIKE '%'", "empty")
    assertInvalid(e, "SELECT k FROM sm1 WHERE v LIKE '%%'", "empty")
    e.execute("DROP INDEX sm1_pref")
    // non-tokenized CONTAINS mode serves prefix, suffix, contains AND match
    // (SASIIndexTest.java:2146-2196)
    e.execute("CREATE CUSTOM INDEX sm1_cont ON sm1 (v) " +
      "USING 'org.apache.cassandra.index.sasi.SASIIndex' WITH OPTIONS = {'mode': 'CONTAINS'}")
    assert(rows(e.execute("SELECT k FROM sm1 WHERE v LIKE 'Pav%'")) === Set(Seq(1)))
    assert(rows(e.execute("SELECT k FROM sm1 WHERE v LIKE '%vel'")) === Set(Seq(1)))
    assert(rows(e.execute("SELECT k FROM sm1 WHERE v LIKE '%ave%'")) === Set(Seq(1)))
    assert(rows(e.execute("SELECT k FROM sm1 WHERE v LIKE 'Pav'")) === Set.empty[Seq[Any]])
    assert(rows(e.execute("SELECT k FROM sm1 WHERE v LIKE 'Pavel'")) === Set(Seq(1)))
    e.execute("DROP INDEX sm1_cont")
    // (SPARSE on a text column is rejected at CREATE — see the SPARSE case
    // below — so no LIKE-on-SPARSE serving question arises for literals)
    // with no index at all, this engine's documented superset still accepts
    // LIKE under ALLOW FILTERING
    assert(rows(e.execute("SELECT k FROM sm1 WHERE v LIKE '%vel' ALLOW FILTERING")) === Set(Seq(1)))
  }

  test("SASI SPARSE serves numeric ranges; tokenized indexes drop EQ/PREFIX " +
    "(SASIIndex.java:140-165 validation; ColumnIndex.supports:219-228)") {
    val e = mkEngine
    e.execute("CREATE TABLE sp1 (k int PRIMARY KEY, age int, v text)")
    (1 to 5).foreach(i => e.execute(s"INSERT INTO sp1 (k, age, v) VALUES ($i, ${i * 10}, 'n$i')"))
    // range on an unindexed regular column requires filtering
    assertInvalid(e, "SELECT k FROM sp1 WHERE age > 25", "ALLOW FILTERING")
    // SPARSE is numeric-only and analyzer-free; unknown modes are rejected
    assertInvalid(e, "CREATE CUSTOM INDEX sp1_bad ON sp1 (v) " +
      "USING 'org.apache.cassandra.index.sasi.SASIIndex' WITH OPTIONS = {'mode': 'SPARSE'}",
      "SPARSE mode is only supported on non-literal columns")
    assertInvalid(e, "CREATE CUSTOM INDEX sp1_bad2 ON sp1 (age) " +
      "USING 'org.apache.cassandra.index.sasi.SASIIndex' " +
      "WITH OPTIONS = {'mode': 'SPARSE', 'analyzed': 'true'}",
      "SPARSE mode doesn't support analyzers")
    assertInvalid(e, "CREATE CUSTOM INDEX sp1_bad3 ON sp1 (age) " +
      "USING 'org.apache.cassandra.index.sasi.SASIIndex' WITH OPTIONS = {'mode': 'BOGUS'}",
      "Incorrect index mode")
    // a SPARSE index serves numeric ranges and EQ without ALLOW FILTERING
    e.execute("CREATE CUSTOM INDEX sp1_age ON sp1 (age) " +
      "USING 'org.apache.cassandra.index.sasi.SASIIndex' WITH OPTIONS = {'mode': 'SPARSE'}")
    assert(rows(e.execute("SELECT k FROM sp1 WHERE age > 25")) ===
      Set(Seq(3), Seq(4), Seq(5)))
    assert(rows(e.execute("SELECT k FROM sp1 WHERE age = 20")) === Set(Seq(2)))
    // tokenized (analyzed) CONTAINS: suffix/contains still served, PREFIX
    // is a hard error and EQ falls back to requiring ALLOW FILTERING
    e.execute("CREATE CUSTOM INDEX sp1_tok ON sp1 (v) " +
      "USING 'org.apache.cassandra.index.sasi.SASIIndex' " +
      "WITH OPTIONS = {'mode': 'CONTAINS', 'analyzed': 'true'}")
    assert(rows(e.execute("SELECT k FROM sp1 WHERE v LIKE '%1'")) === Set(Seq(1)))
    assertInvalid(e, "SELECT k FROM sp1 WHERE v LIKE 'n%'", "only supported")
    assertInvalid(e, "SELECT k FROM sp1 WHERE v = 'n1'", "ALLOW FILTERING")
    // custom indexes reject multi-cell collection targets
    e.execute("CREATE TABLE sp2 (k int PRIMARY KEY, tags set<text>)")
    assertInvalid(e, "CREATE CUSTOM INDEX sp2_bad ON sp2 (tags) " +
      "USING 'org.apache.cassandra.index.sasi.SASIIndex'",
      "complex columns are not yet supported by SASI")
  }

  test("case-normalizing SASI analyzer makes served LIKE case-insensitive " +
    "(NonTokenizingOptions:104-138, NonTokenizingAnalyzer.java:91; " +
    "SASIIndexTest case-sensitivity shapes)") {
    val e = mkEngine
    e.execute("CREATE TABLE cs1 (k int PRIMARY KEY, v text)")
    e.execute("INSERT INTO cs1 (k, v) VALUES (1, 'Quick Brown Fox')")
    e.execute("INSERT INTO cs1 (k, v) VALUES (2, 'quick brown fox')")
    e.execute("CREATE CUSTOM INDEX cs1_ci ON cs1 (v) " +
      "USING 'org.apache.cassandra.index.sasi.SASIIndex' " +
      "WITH OPTIONS = {'mode': 'CONTAINS', 'case_sensitive': 'false'}")
    // both casings match through the normalizing analyzer
    assert(rows(e.execute("SELECT k FROM cs1 WHERE v LIKE 'QUICK%'")) ===
      Set(Seq(1), Seq(2)))
    assert(rows(e.execute("SELECT k FROM cs1 WHERE v LIKE '%FOX'")) ===
      Set(Seq(1), Seq(2)))
    // a case-sensitive index (the default) matches exactly
    e.execute("CREATE TABLE cs2 (k int PRIMARY KEY, v text)")
    e.execute("INSERT INTO cs2 (k, v) VALUES (1, 'Quick')")
    e.execute("INSERT INTO cs2 (k, v) VALUES (2, 'quick')")
    e.execute("CREATE CUSTOM INDEX cs2_cs ON cs2 (v) " +
      "USING 'org.apache.cassandra.index.sasi.SASIIndex'")
    assert(rows(e.execute("SELECT k FROM cs2 WHERE v LIKE 'quick%'")) === Set(Seq(2)))
    // normalize_* is an alias family that cannot combine with case_sensitive
    assertInvalid(e, "CREATE CUSTOM INDEX cs2_bad ON cs2 (v) " +
      "USING 'org.apache.cassandra.index.sasi.SASIIndex' " +
      "WITH OPTIONS = {'case_sensitive': 'false', 'normalize_lowercase': 'true'}",
      "cannot be specified together")
    // unserved LIKE (no index) stays case-exact under ALLOW FILTERING
    e.execute("CREATE TABLE cs3 (k int PRIMARY KEY, v text)")
    e.execute("INSERT INTO cs3 (k, v) VALUES (1, 'Quick')")
    assert(rows(e.execute("SELECT k FROM cs3 WHERE v LIKE 'quick%' ALLOW FILTERING")) ===
      Set.empty[Seq[Any]])
  }

  test("index selection ranks by build-time selectivity estimate, creation " +
    "order breaking ties (SecondaryIndexManager.getBestIndexFor:1047-1052; " +
    "SASIIndex.getEstimatedResultRows)") {
    val e = mkEngine
    e.execute("CREATE TABLE sel1 (k int PRIMARY KEY, v text)")
    // case-folding collapses distinctness: the case-insensitive index
    // stores 2 distinct terms over 5 rows (2.5 rows/term), the
    // case-sensitive one 5 over 5 (1.0 rows/term) — more selective
    Seq("Quick", "quick", "QUICK", "Brown", "brown").zipWithIndex.foreach {
      case (v, i) => e.execute(s"INSERT INTO sel1 (k, v) VALUES ($i, '$v')")
    }
    // the LESS selective index is created FIRST — creation order alone
    // would pick it
    e.execute("CREATE CUSTOM INDEX sel1_ci ON sel1 (v) " +
      "USING 'org.apache.cassandra.index.sasi.SASIIndex' " +
      "WITH OPTIONS = {'mode': 'CONTAINS', 'case_sensitive': 'false'}")
    e.execute("CREATE CUSTOM INDEX sel1_cs ON sel1 (v) " +
      "USING 'org.apache.cassandra.index.sasi.SASIIndex'")
    // the later, more-selective case-sensitive index serves → exact match
    assert(rows(e.execute("SELECT k FROM sel1 WHERE v LIKE 'quick%'")) ===
      Set(Seq(1)))
    // equal estimates (same analyzer shape) fall back to creation order:
    // drop the case-sensitive one, the case-insensitive pick returns
    e.execute("DROP INDEX sel1_cs")
    assert(rows(e.execute("SELECT k FROM sel1 WHERE v LIKE 'quick%'")) ===
      Set(Seq(0), Seq(1), Seq(2)))
  }

  test("tokenized SASI matching is per-term: both sides pass the analyzer " +
    "(Expression.validateStringValue:272-308, Operation.analyzeGroup:288-338; " +
    "SASIIndexTest analyzed-prefix + tokenized-contains cases)") {
    val e = mkEngine
    // PREFIX + analyzed (no analyzer_class → StandardAnalyzer per
    // IndexMode.getAnalyzer:74-86): 'Jean-Claude' indexes as [Jean, Claude]
    e.execute("CREATE TABLE tk1 (k int PRIMARY KEY, v text)")
    e.execute("INSERT INTO tk1 (k, v) VALUES (0, 'Jean-Claude')")
    e.execute("CREATE CUSTOM INDEX tk1_v ON tk1 (v) " +
      "USING 'org.apache.cassandra.index.sasi.SASIIndex' " +
      "WITH OPTIONS = {'mode': 'PREFIX', 'analyzed': 'true'}")
    // LIKE '<term>' (match) equals ANY token — the full-text hit the
    // whole-value match can't produce (SASIIndexTest:2248-2256)
    assert(rows(e.execute("SELECT k FROM tk1 WHERE v LIKE 'Jean'")) === Set(Seq(0)))
    assert(rows(e.execute("SELECT k FROM tk1 WHERE v LIKE 'Claude'")) === Set(Seq(0)))
    // the QUERY term tokenizes too; its tokens are OR'd expressions
    assert(rows(e.execute("SELECT k FROM tk1 WHERE v LIKE 'Jean-Claude'")) === Set(Seq(0)))
    // prefix applies per token: 'Claude%' hits though the VALUE starts 'Jean'
    assert(rows(e.execute("SELECT k FROM tk1 WHERE v LIKE 'Jean%'")) === Set(Seq(0)))
    assert(rows(e.execute("SELECT k FROM tk1 WHERE v LIKE 'Claude%'")) === Set(Seq(0)))
    // no token equals a partial word
    assert(rows(e.execute("SELECT k FROM tk1 WHERE v LIKE 'Jea'")) === Set.empty[Seq[Any]])

    // CONTAINS + StandardAnalyzer with lowercase normalization
    e.execute("CREATE TABLE tk2 (k int PRIMARY KEY, v text)")
    e.execute("INSERT INTO tk2 (k, v) VALUES (1, 'The Quick Brown fox jumps')")
    e.execute("INSERT INTO tk2 (k, v) VALUES (2, 'lazy dogs sleep')")
    e.execute("CREATE CUSTOM INDEX tk2_v ON tk2 (v) " +
      "USING 'org.apache.cassandra.index.sasi.SASIIndex' " +
      "WITH OPTIONS = {'mode': 'CONTAINS', 'analyzer_class': " +
      "'org.apache.cassandra.index.sasi.analyzer.StandardAnalyzer', " +
      "'analyzed': 'true', 'tokenization_normalize_lowercase': 'true'}")
    // LIKE '%word%' term-hits the word, case-normalized both sides
    assert(rows(e.execute("SELECT k FROM tk2 WHERE v LIKE '%QUICK%'")) === Set(Seq(1)))
    // match op equals a whole token ('fox' is mid-value — whole-value
    // equality would miss)
    assert(rows(e.execute("SELECT k FROM tk2 WHERE v LIKE 'fox'")) === Set(Seq(1)))
    // suffix applies per token ('quick' ends in 'ick'; the raw value ends
    // in 'jumps')
    assert(rows(e.execute("SELECT k FROM tk2 WHERE v LIKE '%ick'")) === Set(Seq(1)))
    // a needle crossing a token boundary with no split char matches no term
    assert(rows(e.execute("SELECT k FROM tk2 WHERE v LIKE '%quickbrown%'")) ===
      Set.empty[Seq[Any]])
    // EQ and PREFIX serving stay dropped on tokenized CONTAINS
    assertInvalid(e, "SELECT k FROM tk2 WHERE v LIKE 'fox%'", "only supported")
    assertInvalid(e, "SELECT k FROM tk2 WHERE v = 'fox'", "ALLOW FILTERING")
  }

  test("DelimiterAnalyzer tokenizes on the configured character " +
    "(DelimiterAnalyzer.java:80-100, DelimiterTokenizingOptions:42-64; " +
    "comma default, single-char validation, no case folding)") {
    val e = mkEngine
    e.execute("CREATE TABLE da1 (k int PRIMARY KEY, v text)")
    e.execute("INSERT INTO da1 (k, v) VALUES (1, 'apple,Banana,,cherry')")
    e.execute("INSERT INTO da1 (k, v) VALUES (2, 'dog;cat')")
    e.execute("CREATE CUSTOM INDEX da1_v ON da1 (v) " +
      "USING 'org.apache.cassandra.index.sasi.SASIIndex' " +
      "WITH OPTIONS = {'mode': 'CONTAINS', 'analyzer_class': " +
      "'org.apache.cassandra.index.sasi.analyzer.DelimiterAnalyzer', " +
      "'analyzed': 'true', 'delimiter': ','}")
    // match equals a whole comma-term; the empty token between ',,' is
    // skipped, and ';' is NOT a split point under a ',' delimiter
    assert(rows(e.execute("SELECT k FROM da1 WHERE v LIKE 'cherry'")) === Set(Seq(1)))
    assert(rows(e.execute("SELECT k FROM da1 WHERE v LIKE 'dog;cat'")) === Set(Seq(2)))
    assert(rows(e.execute("SELECT k FROM da1 WHERE v LIKE 'dog'")) === Set.empty[Seq[Any]])
    // no case normalization: 'banana' misses the stored 'Banana'
    assert(rows(e.execute("SELECT k FROM da1 WHERE v LIKE 'banana'")) === Set.empty[Seq[Any]])
    assert(rows(e.execute("SELECT k FROM da1 WHERE v LIKE 'Banana'")) === Set(Seq(1)))
    // contains/suffix apply per comma-term
    assert(rows(e.execute("SELECT k FROM da1 WHERE v LIKE '%err%'")) === Set(Seq(1)))
    assert(rows(e.execute("SELECT k FROM da1 WHERE v LIKE '%cat'")) === Set(Seq(2)))
    // a multi-character delimiter is rejected at CREATE
    assertInvalid(e, "CREATE CUSTOM INDEX da1_bad ON da1 (v) " +
      "USING 'org.apache.cassandra.index.sasi.SASIIndex' " +
      "WITH OPTIONS = {'mode': 'CONTAINS', 'analyzer_class': " +
      "'org.apache.cassandra.index.sasi.analyzer.DelimiterAnalyzer', " +
      "'analyzed': 'true', 'delimiter': ',,'}",
      "Only single character delimiters supported")
  }

  test("analyzed non-literal SASI index still serves ranges " +
    "(ColumnIndex.supports:219-229 — tokenization drops only EQ and " +
    "CONTAINS-mode PREFIX serving, never RANGE)") {
    val e = mkEngine
    e.execute("CREATE TABLE sr1 (k int PRIMARY KEY, age int)")
    (1 to 5).foreach(i => e.execute(s"INSERT INTO sr1 (k, age) VALUES ($i, ${i * 10})"))
    e.execute("CREATE CUSTOM INDEX sr1_age ON sr1 (age) " +
      "USING 'org.apache.cassandra.index.sasi.SASIIndex' " +
      "WITH OPTIONS = {'mode': 'PREFIX', 'analyzed': 'true'}")
    // ranges are served by the tokenized numeric index...
    assert(rows(e.execute("SELECT k FROM sr1 WHERE age > 25")) ===
      Set(Seq(3), Seq(4), Seq(5)))
    // ...but EQ serving is dropped by tokenization
    assertInvalid(e, "SELECT k FROM sr1 WHERE age = 20", "ALLOW FILTERING")
  }
}
