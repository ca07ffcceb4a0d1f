package graft

import graft.cql.Ast._
import graft.cql.JavaUdfShim
import org.scalatest.funsuite.AnyFunSuite

/** Pure-translation unit tests for the LANGUAGE java shim: every body shape
  * the reference validation suite uses (UFTest/AggregationTest/
  * UserTypesTest grep over `LANGUAGE java AS`), plus the rejection
  * contract. No SparkSession — `translate` is pure; end-to-end execution
  * is covered in CqlDdlSpec.
  */
class JavaUdfShimSpec extends AnyFunSuite {

  private def tr(body: String, args: (String, CqlType)*): String =
    JavaUdfShim.translate(body, args)

  private def rejects(body: String, args: (String, CqlType)*): String = {
    val e = intercept[JavaUdfShim.Untranslatable](JavaUdfShim.translate(body, args))
    e.detail
  }

  test("reference-suite body shapes all translate") {
    // identity / passthrough (15× 'return values;', 'return val;', ...)
    assert(tr("return arg;", "arg" -> CqlInt) === "arg")
    assert(tr("return val;", "val" -> CqlText) === "val")
    // literals: 'return 10.0d;', 'return 0;', 'return 1L;', 'return null;'
    assert(tr("return 10.0d;") === "CAST(10.0 AS DOUBLE)")
    assert(tr("return 0;") === "0")
    assert(tr("return 1L;") === "1L")
    assert(tr("return null;") === "NULL")
    assert(tr("return \"foo bar\";") === "'foo bar'")
    // boxing + Math ('return Double.valueOf(Math.sin(input.doubleValue()));')
    assert(tr("return Double.valueOf(Math.sin(input.doubleValue()));",
      "input" -> CqlDouble) === "CAST(sin(CAST(input AS DOUBLE)) AS DOUBLE)")
    assert(tr("return Math.sin(input);", "input" -> CqlDouble) === "sin(input)")
    // the universal SFUNC null-guard ternary
    assert(tr("return Integer.valueOf((a!=null?a.intValue():0) + b.intValue());",
      "a" -> CqlInt, "b" -> CqlInt) ===
      "CAST(((IF((a IS NOT NULL), CAST(a AS INT), 0)) + CAST(b AS INT)) AS INT)")
    // toString / new String ('return a.toString();', 'return new String(a);')
    assert(tr("return a.toString();", "a" -> CqlInt) === "CAST(a AS STRING)")
    assert(tr("return new String(a);", "a" -> CqlBlob) === "CAST(a AS STRING)")
    // string concat stringifies and null-guards ('return \"fin\" + a;')
    assert(tr("return \"fin\" + a;", "a" -> CqlInt) ===
      "concat(COALESCE('fin', 'null'), COALESCE(CAST(a AS STRING), 'null'))")
    // collection access ($$return m;$$, $$return k + c;$$, m1.get shapes)
    assert(tr("return m.get(k);",
      "m" -> CqlMap(CqlText, CqlInt), "k" -> CqlText) === "m[k]")
    assert(tr("return l.get(1);", "l" -> CqlList(CqlInt)) === "l[1]")
    // UDT accessors ($$return udt.getString(\"txt\");$$)
    assert(tr("""return udt.getString("txt");""",
      "udt" -> CqlUdt("t", Seq("txt" -> CqlText, "i" -> CqlInt))) ===
      "CAST(udt.`txt` AS STRING)")
    assert(tr("""return Integer.valueOf(udt.getInt("i"));""",
      "udt" -> CqlUdt("t", Seq("txt" -> CqlText, "i" -> CqlInt))) ===
      "CAST(CAST(udt.`i` AS INT) AS INT)")
  }

  test("Java semantics: int division, Math.round, char concat, null on left") {
    assert(tr("return a / b * 2;", "a" -> CqlInt, "b" -> CqlInt) ===
      "((a div b) * 2)")
    // fractional operand switches back to true division
    assert(tr("return a / b;", "a" -> CqlDouble, "b" -> CqlInt) === "(a / b)")
    assert(tr("return Math.round(x);", "x" -> CqlDouble) ===
      "CAST(FLOOR(CAST(x AS DOUBLE) + 0.5D) AS BIGINT)")
    assert(tr("return null == a ? 0 : a.intValue();", "a" -> CqlInt) ===
      "IF((a IS NULL), 0, CAST(a AS INT))")
    // char literals concat as strings ($$return m1.get(1) + ':' + ...$$)
    assert(tr("return s + ':' + k;", "s" -> CqlText, "k" -> CqlInt) ===
      "concat(COALESCE(concat(COALESCE(s, 'null'), COALESCE(':', 'null')), 'null'), " +
        "COALESCE(CAST(k AS STRING), 'null'))")
  }

  test("String methods translate with Java index/semantics conventions") {
    assert(tr("return s.length();", "s" -> CqlText) === "length(s)")
    assert(tr("return s.toLowerCase();", "s" -> CqlText) === "lower(s)")
    assert(tr("return s.trim().toUpperCase();", "s" -> CqlText) === "upper(trim(s))")
    assert(tr("return s.substring(2);", "s" -> CqlText) === "substr(s, (2) + 1)")
    assert(tr("return s.substring(1, 4);", "s" -> CqlText) ===
      "substr(s, (1) + 1, (4) - (1))")
    assert(tr("""return s.indexOf("x");""", "s" -> CqlText) === "(instr(s, 'x') - 1)")
    assert(tr("""return s.replace("a", "b");""", "s" -> CqlText) ===
      "replace(s, 'a', 'b')")
    assert(tr("""return s.equalsIgnoreCase(t) ? 1 : 0;""",
      "s" -> CqlText, "t" -> CqlText) === "IF((lower(s) = lower(t)), 1, 0)")
    assert(tr("""return s.startsWith("p") ? s.concat(t) : t;""",
      "s" -> CqlText, "t" -> CqlText) === "IF(startswith(s, 'p'), concat(s, t), t)")
    // string methods on non-string receivers stay unsupported
    assert(rejects("return x.length();", "x" -> CqlInt).contains("unsupported method"))
  }

  test("char rung: literals, charAt, widening, declarations, rejections") {
    // charAt guards the out-of-bounds throw like Java; returning the char
    // itself widens to its code point (CQL has no char return type)
    assert(tr("return s.charAt(2);", "s" -> CqlText) ===
      "ascii((CASE WHEN (2) < 0 OR (2) >= length(s) " +
        "THEN raise_error(concat('String index out of range: ', CAST(2 AS STRING))) " +
        "ELSE substr(s, (2) + 1, 1) END))")
    // char == char compares as 1-char strings (code-point order)
    assert(tr("return s.charAt(0) == 'a';", "s" -> CqlText).endsWith("= 'a')"))
    // char + int is Java INT arithmetic, not concat
    assert(tr("return 'a' + 1;") === "(ascii('a') + 1)")
    // char vs numeric comparison widens the char side
    assert(tr("return 'a' < x;", "x" -> CqlInt) === "(ascii('a') < x)")
    // String + char appends the char verbatim (no ascii)
    assert(tr("""return "p" + 'q';""") ===
      "concat(COALESCE('p', 'null'), COALESCE('q', 'null'))")
    // two-arg indexOf: 1-based locate, negative from clamps to 0 like Java
    assert(tr("""return s.indexOf("b", f);""", "s" -> CqlText, "f" -> CqlInt) ===
      "(locate('b', s, greatest((f) + 1, 1)) - 1)")
    // char declaration binds; numeric declaration widens a char initializer
    assert(tr("char c = 'z'; return c == 'z';") === "(CAST(('z') AS STRING) = 'z')")
    assert(tr("int x = 'a'; return x;") === "CAST((ascii('a')) AS INT)")
    // Java-invalid char crossings reject by name
    assert(rejects("char c = 5; return 0;").contains("char declarations"))
    assert(rejects("String t = 'a'; return t;").contains("not assignable"))
    // multi-char single-quoted text keeps the lenient string reading
    assert(tr("return 'abc';") === "'abc'")
  }

  test("statement bodies: local declarations inline their initializers") {
    assert(tr("int s = 0; return s;") === "CAST((0) AS INT)")
    assert(tr("int twice = x + x; return twice * twice;", "x" -> CqlInt) ===
      "(CAST(((x + x)) AS INT) * CAST(((x + x)) AS INT))")
    // the declared type is a conversion: double d = intExpr switches later
    // division to fractional
    assert(tr("double d = x; return d / 2;", "x" -> CqlInt) ===
      "(CAST((x) AS DOUBLE) / 2)")
    // int-typed declaration keeps truncating division
    assert(tr("int i = x; return i / 2;", "x" -> CqlInt) ===
      "(CAST((x) AS INT) div 2)")
    assert(tr("final String p = s.trim(); return p.length();", "s" -> CqlText) ===
      "length(CAST((trim(s)) AS STRING))")
    // var infers from the initializer
    assert(tr("var v = s.length(); return v / 2;", "s" -> CqlText) ===
      "((length(s)) div 2)")
    // chained locals
    assert(tr("int a2 = x * x; int a4 = a2 * a2; return a4;", "x" -> CqlInt) ===
      "CAST(((CAST(((x * x)) AS INT) * CAST(((x * x)) AS INT))) AS INT)")
  }

  test("statement bodies: if/else chains lower to nested IF") {
    assert(tr("if (x > 0) return 1; return 0;", "x" -> CqlInt) ===
      "IF((x > 0), 1, 0)")
    assert(tr("if (x > 0) { return 1; } else { return 0; }", "x" -> CqlInt) ===
      "IF((x > 0), 1, 0)")
    assert(tr("if (x > 10) return 2; else if (x > 0) return 1; return 0;",
      "x" -> CqlInt) === "IF((x > 10), 2, IF((x > 0), 1, 0))")
    // fall-through join point: the continuation duplicates into the
    // non-returning path
    assert(tr("if (x > 0) { if (x > 10) return 2; } return 0;", "x" -> CqlInt) ===
      "IF((x > 0), IF((x > 10), 2, 0), 0)")
    // declarations inside a branch stay block-scoped
    assert(tr("if (x > 0) { int y = x * 2; return y; } return 0;", "x" -> CqlInt) ===
      "IF((x > 0), CAST(((x * 2)) AS INT), 0)")
    assert(rejects("if (x > 0) { int y = 1; return y; } return y;", "x" -> CqlInt)
      .contains("unknown identifier 'y'"))
  }

  test("statement bodies: javac's definite-return and unreachable rules") {
    assert(rejects("if (x > 0) return 1;", "x" -> CqlInt)
      .contains("missing return"))
    assert(rejects("int y = 1;").contains("missing return"))
    assert(rejects("return 1; return 2;").contains("unreachable"))
    assert(rejects("if (x > 0) return 1; else return 2; return 3;", "x" -> CqlInt)
      .contains("unreachable"))
    assert(rejects("int x2 = 1; int x2 = 2; return x2;")
      .contains("already defined"))
    assert(rejects("int x = 1; return x;", "x" -> CqlInt)
      .contains("already defined"))
  }

  test("switch in the return-arm form lowers to the equality IF chain; " +
    "anything needing mutation rejects") {
    // dispatch table with shared labels and a default
    assert(tr("switch (a) { case 1: case 2: return 10; case 3: return 20; " +
      "default: return 0; }", "a" -> CqlInt) ===
      "IF(((a = 1) OR (a = 2)), 10, IF(((a = 3)), 20, 0))")
    // no default: falls out of the switch to the following statements
    assert(tr("switch (a) { case -1: return 1; } return 9;", "a" -> CqlInt) ===
      "IF(((a = (- 1))), 1, 9)")
    // String switch compares by value (Java .equals)
    assert(tr("""switch (s) { case "en": return 1; case "fr": return 2; """ +
      "default: return 0; }", "s" -> CqlText) ===
      "IF(((s = 'en')), 1, IF(((s = 'fr')), 2, 0))")
    // char selector (charAt gives TChar): char label compares as a
    // 1-char string; an int label promotes the selector through ascii
    val chEq = tr("switch (s.charAt(0)) { case 'x': return 1; default: return 0; }",
      "s" -> CqlText)
    assert(chEq.contains("= 'x'") && chEq.startsWith("IF("), chEq)
    val chNum = tr("switch (s.charAt(0)) { case 120: return 1; default: return 0; }",
      "s" -> CqlText)
    assert(chNum.contains("ascii(") && chNum.contains("= 120"), chNum)
    // a String selector with a char label is illegal Java — reject
    assert(rejects("switch (s) { case 'x': return 1; default: return 0; }",
      "s" -> CqlText).contains("assignment-compatible"))
    // default position is immaterial when every arm returns
    assert(tr("switch (a) { default: return 0; case 7: return 1; }",
      "a" -> CqlInt) === "IF(((a = 7)), 1, 0)")
    // default sharing a case label maps both to the same body
    assert(tr("switch (a) { case 5: default: return 3; case 6: return 4; }",
      "a" -> CqlInt) === "IF(((a = 5)), 3, IF(((a = 6)), 4, 3))")
    // javac rules still apply through the lowering
    assert(rejects("switch (a) { case 1: return 1; default: return 0; } return 9;",
      "a" -> CqlInt).contains("unreachable"))
    assert(rejects("switch (a) { case 1: return 1; }", "a" -> CqlInt)
      .contains("missing return"))
    // rejection contract: statement arms, break, non-literal labels,
    // floating selectors, incompatible labels, duplicate default
    assert(rejects("switch (a) { case 1: a = 2; break; default: return 0; }",
      "a" -> CqlInt).contains("return <expr>;"))
    assert(rejects("switch (a) { case b: return 1; default: return 0; }",
      "a" -> CqlInt, "b" -> CqlInt).contains("literal constants"))
    assert(rejects("switch (d) { case 1: return 1; default: return 0; }",
      "d" -> CqlDouble).contains("floating"))
    assert(rejects("""switch (a) { case "x": return 1; default: return 0; }""",
      "a" -> CqlInt).contains("assignment-compatible"))
    assert(rejects("switch (a) { default: return 1; default: return 0; }",
      "a" -> CqlInt).contains("duplicate default"))
    assert(rejects("switch (a) { }", "a" -> CqlInt).contains("empty switch"))
    // javac rejects duplicate case labels — including across arms, and
    // char/int labels that convert to the same constant
    assert(rejects("switch (a) { case 1: return 1; case 1: return 2; " +
      "default: return 0; }", "a" -> CqlInt).contains("duplicate case label"))
    assert(rejects("switch (a) { case 2: case 2: return 1; default: return 0; }",
      "a" -> CqlInt).contains("duplicate case label"))
    assert(rejects("switch (s.charAt(0)) { case 'x': return 1; case 120: " +
      "return 2; default: return 0; }", "s" -> CqlText)
      .contains("duplicate case label"))
    assert(rejects("""switch (s) { case "en": return 1; case "en": return 2; """ +
      "default: return 0; }", "s" -> CqlText).contains("duplicate case label"))
  }

  test("parse statics pin Java's string grammars; tolerant-parse " +
    "try/catch lowers to COALESCE; general try rejects") {
    // parseInt: sign+digits only — the regex guard rejects what CAST
    // would silently accept (whitespace, decimal points)
    // \z anchor, not $: java.util.regex '$' matches before a trailing
    // newline, so "12\n" would pass the guard while Java's parseInt throws
    val pi = tr("return Integer.parseInt(s);", "s" -> CqlText)
    assert(pi === "IF(s RLIKE '^[+-]?[0-9]+\\\\z', CAST(s AS INT), NULL)", pi)
    assert(tr("return Long.parseLong(s);", "s" -> CqlText).contains("AS BIGINT"))
    assert(tr("return Double.parseDouble(s);", "s" -> CqlText) ===
      "CAST(s AS DOUBLE)")
    // parseBoolean never throws: null input is false, like Java
    assert(tr("return Boolean.parseBoolean(s);", "s" -> CqlText) ===
      "COALESCE((lower(s) = 'true'), false)")
    // the canonical tolerant-parse UDF
    assert(tr("try { return Integer.parseInt(s); } " +
      "catch (NumberFormatException e) { return -1; }", "s" -> CqlText) ===
      "COALESCE(IF(s RLIKE '^[+-]?[0-9]+\\\\z', CAST(s AS INT), NULL), (- 1))")
    // dotted exception names; char catch arm widens into a numeric try
    assert(tr("try { return Integer.parseInt(s); } " +
      "catch (java.lang.Exception e) { return 'x'; }", "s" -> CqlText)
      .contains("ascii('x')"))
    // a null catch arm is legal Java
    assert(tr("try { return Integer.parseInt(s); } " +
      "catch (Exception e) { return null; }", "s" -> CqlText)
      .startsWith("COALESCE("))
    // rejection contract: general try bodies, multi-catch, missing catch,
    // cross-kind arms, statement catch bodies
    assert(rejects("try { return a + 1; } catch (Exception e) { return 0; }",
      "a" -> CqlInt).contains("tolerant-parse"))
    // the try body must be EXACTLY the parse call: trailing operators can
    // throw in Java (ArithmeticException on /0) where SQL would null and
    // silently take the catch arm
    assert(rejects("try { return Integer.parseInt(s) / a; } catch " +
      "(Exception e) { return 0; }", "s" -> CqlText, "a" -> CqlInt)
      .contains("exactly the parse call"))
    assert(rejects("try { return Integer.parseInt(s) + 1; } catch " +
      "(Exception e) { return 0; }", "s" -> CqlText)
      .contains("exactly the parse call"))
    // nested parens inside the argument are still the bare-call shape
    assert(tr("try { return Integer.parseInt(s.substring((1), (3))); } " +
      "catch (Exception e) { return 0; }", "s" -> CqlText)
      .startsWith("COALESCE("))
    assert(rejects("try { return Integer.parseInt(s); } catch " +
      "(NumberFormatException | NullPointerException e) { return 0; }",
      "s" -> CqlText).contains("multi-catch"))
    assert(rejects("try { return Integer.parseInt(s); } return 0;",
      "s" -> CqlText).contains("without catch"))
    assert(rejects("try { return Integer.parseInt(s); } catch (Exception e) " +
      "{ return \"no\"; }", "s" -> CqlText).contains("assignment-compatible"))
    assert(rejects("try { return Integer.parseInt(s); } catch (Exception e) " +
      "{ int x = 1; return x; }", "s" -> CqlText).contains("single"))
    // unreachable code after an always-returning try/catch, like javac
    assert(rejects("try { return Integer.parseInt(s); } catch (Exception e) " +
      "{ return 0; } return 9;", "s" -> CqlText).contains("unreachable"))
  }

  test("array locals: literal lookup tables index with Java bounds " +
    "semantics; sized allocation and element writes reject") {
    // the dispatch-table shape: bounds guard + element_at + raise_error
    val idx = tr("int[] t = {10, 20, 30}; return t[a];", "a" -> CqlInt)
    assert(idx.contains("ARRAY(CAST((10) AS INT), CAST((20) AS INT), " +
      "CAST((30) AS INT))"), idx)
    assert(idx.contains("element_at(") && idx.contains("< 3") &&
      idx.contains("raise_error('Array index out of bounds')"), idx)
    // new T[]{...} form; char elements widen into numeric arrays
    assert(tr("long[] t = new long[]{'a', 98}; return t[0];")
      .contains("CAST((ascii('a')) AS BIGINT)"))
    // .length is a parse-time constant
    assert(tr("double[] w = {0.5, 0.25}; return w.length;") === "2")
    assert(tr("String[] names = {\"x\", \"y\"}; return names[i];",
      "i" -> CqlInt).contains("ARRAY('x', 'y')"))
    // expressions as elements; arrays participate in larger expressions
    val expr = tr("int[] t = {a + 1, a * 2}; return t[0] + t[1];", "a" -> CqlInt)
    assert(expr.contains("ARRAY(CAST(((a + 1)) AS INT)"), expr)
    // javac rules: element/declaration type mismatch, sized allocation,
    // constructor type mismatch, duplicate names, writes
    assert(rejects("int[] t = {\"x\"}; return t[0];")
      .contains("assignment-compatible"))
    assert(rejects("int[] t = new int[5]; return t[0];")
      .contains("sized array allocation"))
    assert(rejects("int[] t = new long[]{1}; return t[0];")
      .contains("does not match the declaration"))
    assert(rejects("int[] t = {1}; int t = 2; return t;")
      .contains("already defined"))
    assert(rejects("int[] t = {1, 2}; t[0] = 5; return t[0];", "a" -> CqlInt)
      .contains("unsupported statement"))
    assert(rejects("int[] t = {1}; return t[\"x\"];")
      .contains("array index"))
    assert(rejects("int[] t = {}; return t.length;").contains("empty array"))
  }

  test("Math.min/max keep Java NaN propagation and null poisoning") {
    assert(tr("return Math.min(a, b);", "a" -> CqlInt, "b" -> CqlInt) ===
      "IF((a) IS NULL OR (b) IS NULL, NULL, IF((a) <= (b), a, b))")
    assert(tr("return Math.max(a, b);", "a" -> CqlInt, "b" -> CqlInt) ===
      "IF((a) IS NULL OR (b) IS NULL, NULL, IF((a) >= (b), a, b))")
    val dmin = tr("return Math.min(a, b);", "a" -> CqlDouble, "b" -> CqlDouble)
    assert(dmin.contains("isnan"))
    assert(dmin.contains("CAST('NaN' AS DOUBLE)"))
  }

  test("counted for-loops lower to aggregate(sequence) folds") {
    // UFTest.java:441 — the reference suite's StringBuilder repeat UDF
    val repeat = tr(
      "StringBuilder sb = new StringBuilder();\n" +
        "for (int i = 0; i < n; i++)\n" +
        "    sb.append(v);\n" +
        "return sb.toString();",
      "v" -> CqlText, "n" -> CqlInt)
    assert(repeat.contains("aggregate(sequence("))
    assert(repeat.contains("concat("))
    // numeric accumulation, braced body, compound assignment
    val tri = tr("long s = 0; for (int i = 1; i <= n; i++) { s += i; } return s;",
      "n" -> CqlInt)
    assert(tri.contains("aggregate(sequence("))
    // loop-shape and body restrictions keep their rejection contract
    assert(rejects("int s = 0; for (int i = n; i > 0; i--) s += i; return s;",
      "n" -> CqlInt).contains("ascending"))
    // positive constant steps translate (sequence walks Java's iterates)
    val step2 = tr("int s = 0; for (int i = 0; i < n; i += 2) s += i; return s;",
      "n" -> CqlInt)
    assert(step2.contains("aggregate(sequence(") && step2.contains(", 2L)"), step2)
    // variable and non-positive steps still reject
    assert(rejects("int s = 0; for (int i = 0; i < n; i += n) s += i; return s;",
      "n" -> CqlInt).contains("positive constant"))
    // multi-accumulator bodies lower to a struct fold (named_struct
    // threading both locals through one aggregate)
    val two = tr("int s = 0; int t = 0; for (int i = 0; i < n; i++) { s += i; t += i; } return s + t;",
      "n" -> CqlInt)
    assert(two.contains("aggregate(sequence(") && two.contains("named_struct("))
    assert(rejects("for (int i = 0; i < n; i++) return i; return 0;",
      "n" -> CqlInt).contains("not supported"))
    assert(rejects("int s = 0; for (int i = 0; i < n; i++) s += n.frobnicate(); return s;",
      "n" -> CqlInt).contains("unsupported method call"))
    // Java re-evaluates the condition per iteration; a bound reading the
    // accumulator is data-dependent and must reject, not mistranslate
    assert(rejects("int s = 10; for (int i = 0; i < s; i++) s = s - 1; return s;")
      .contains("data-dependent"))
    assert(rejects("String a = \"x\"; for (int i = 0; i < n; i++) a *= 2; return a;",
      "n" -> CqlInt).contains("numeric operands"))
    // mutating an outer-scope local from a branch-nested loop would be
    // discarded by the branch-exit restore — must reject, not mistranslate
    assert(rejects(
      "int s = 0; if (n > 0) { for (int i = 0; i < n; i++) s += i; } return s;",
      "n" -> CqlInt).contains("same block"))
  }

  test("NESTED counted loops lower recursively: inner folds become outer " +
    "fold statements; inner bounds may read the outer loop variable") {
    // triangular-of-triangular: Σ_{i=1..n} Σ_{j=1..i} j — the inner bound
    // reads i, so the inner fold's sequence upper end is an outer-lambda
    // expression (Java's per-iteration bound re-evaluation)
    val nested = tr(
      "long s = 0; for (int i = 1; i <= n; i++) " +
        "for (int j = 1; j <= i; j++) s += j; return s;",
      "n" -> CqlInt)
    assert("aggregate\\(sequence\\(".r.findAllIn(nested).size === 2,
      s"expected two nested folds in:\n$nested")
    // multi-accumulator outer + nested inner (struct fold nesting): the
    // inner fold threads s, the outer threads s AND t
    val mixed = tr(
      "int s = 0; int t = 0; for (int i = 0; i < n; i++) { " +
        "t += i; for (int j = 0; j < i; j++) s += j; } return s * 31 + t;",
      "n" -> CqlInt)
    assert(mixed.contains("named_struct("), mixed)
    // each post-loop field access inlines a copy of the fold (Spark's
    // codegen subexpression elimination dedupes) — two folds per copy
    assert("aggregate\\(sequence\\(".r.findAllIn(mixed).size >= 2, mixed)
    // three levels deep — the recursion has no depth cliff
    val deep = tr(
      "long s = 0; for (int i = 0; i < 3; i++) for (int j = 0; j <= i; j++) " +
        "for (int k = 0; k < j; k++) s += 1; return s;")
    assert("aggregate\\(sequence\\(".r.findAllIn(deep).size === 3, deep)
    // StringBuilder accumulation through a nested loop
    val sb = tr(
      "StringBuilder b = new StringBuilder(); " +
        "for (int i = 0; i < n; i++) for (int j = 0; j <= i; j++) " +
        "b.append(v); return b.toString();",
      "v" -> CqlText, "n" -> CqlInt)
    assert(sb.contains("concat(") &&
      "aggregate\\(sequence\\(".r.findAllIn(sb).size === 2, sb)
    // rejections stay honest: inner loop var shadowing (javac rejects),
    // inner decrementing loops, for-loops inside a loop's if-branch, and
    // an inner bound reading an accumulator the inner body mutates
    assert(rejects(
      "int s = 0; for (int i = 0; i < n; i++) for (int i = 0; i < 2; i++) " +
        "s += 1; return s;", "n" -> CqlInt).contains("already defined"))
    assert(rejects(
      "int s = 0; for (int i = 0; i < n; i++) for (int j = i; j > 0; j--) " +
        "s += j; return s;", "n" -> CqlInt).contains("ascending"))
    assert(rejects(
      "int s = 0; for (int i = 0; i < n; i++) { if (i > 2) " +
        "for (int j = 0; j < i; j++) s += j; } return s;",
      "n" -> CqlInt).contains("branch"))
    assert(rejects(
      "int s = 3; for (int i = 0; i < n; i++) " +
        "for (int j = 0; j < s; j++) s += 1; return s;",
      "n" -> CqlInt).contains("data-dependent"))
  }

  test("rejection contract: anything beyond the statement surface") {
    // while(true) is not a counted scan — rejected with while-specific text
    assert(rejects("while (true) { } return 0;")
      .contains("must be a local declared before the loop"))
    assert(rejects("try { return 1; } catch (Exception e) { return 0; }")
      .contains("tolerant-parse"))
    assert(rejects("int y = 0; y = 1; return y;").contains("assignment"))
    assert(rejects("return y;", "x" -> CqlInt).contains("unknown identifier 'y'"))
    assert(rejects("return x.frobnicate();", "x" -> CqlInt)
      .contains("unsupported method call"))
    assert(rejects("return new java.util.ArrayList();").nonEmpty)
    assert(rejects("").contains("empty"))
    // declared argument names shadow the static tables
    assert(tr("return Math;", "Math" -> CqlInt) === "Math")
  }

  test("loop rejections name what they reject; body assignments type-check") {
    // a for-loop as an unbraced branch body gets loop-specific text (its
    // accumulation would be discarded by the branch-exit locals restore),
    // not the old "a declaration cannot be the sole statement" message
    assert(rejects(
      "int s = 0; if (n > 0) for (int i = 0; i < n; i++) s += i; return s;",
      "n" -> CqlInt).contains("loop cannot be the sole statement"))
    // a declaration inside a loop body names declarations, not the
    // misleading "unknown identifier 'int'"
    assert(rejects(
      "int s = 0; for (int i = 0; i < n; i++) { int j = i; s += j; } return s;",
      "n" -> CqlInt).contains("declarations inside a counted loop"))
    // javac-invalid `int s; s = "a" + s;` fails with a type error instead
    // of lowering to CAST(<string> AS INT) null/garbage per step
    assert(rejects(
      "int s = 0; for (int i = 0; i < n; i++) { s = \"a\" + s; } return s;",
      "n" -> CqlInt).contains("incompatible types"))
    assert(rejects(
      "String a = \"x\"; for (int i = 0; i < n; i++) { a = i * 2; } return a;",
      "n" -> CqlInt).contains("incompatible types"))
    // the compatible directions keep translating: numeric->numeric
    // (widening int step into a double accumulator) and String->String
    assert(tr(
      "double s = 0; for (int i = 0; i < n; i++) { s = s + i; } return s;",
      "n" -> CqlInt).contains("aggregate(sequence("))
    assert(tr(
      "String a = \"\"; for (int i = 0; i < n; i++) { a = a + i; } return a;",
      "n" -> CqlInt).contains("aggregate(sequence("))
  }

  test("conditional accumulation inside counted loops") {
    // guard on the loop variable
    val evens = tr(
      "int s = 0; for (int i = 0; i < n; i++) { if (i % 2 == 0) s += i; } return s;",
      "n" -> CqlInt)
    assert(evens.contains("aggregate(sequence(") && evens.contains("IF("))
    // guard reading the ACCUMULATOR: evaluated per iteration at its
    // statement position (unlike the loop bound, which must not read it)
    assert(tr(
      "int s = 0; for (int i = 0; i < n; i++) { if (s < 5) s += i; } return s;",
      "n" -> CqlInt).contains("aggregate(sequence("))
    // if/else touching DIFFERENT accumulators lowers to the struct fold
    val split = tr(
      "int lo2 = 0; int hi2 = 0; " +
        "for (int i = 0; i < n; i++) { if (i < 5) lo2 += i; else hi2 += i; } " +
        "return lo2 * 100 + hi2;",
      "n" -> CqlInt)
    assert(split.contains("named_struct(") && split.contains("IF("))
    // unbraced if as the whole loop body
    assert(tr(
      "int s = 0; for (int i = 0; i < n; i++) if (i > 2) s += i; return s;",
      "n" -> CqlInt).contains("aggregate(sequence("))
    // while loops desugar to the counted for; the variable rebinds to
    // its Java post-loop value for later reads
    val whl = tr(
      "int i = 2; int s = 0; while (i < n) { s += i; i++; } return s * 100 + i;",
      "n" -> CqlInt)
    assert(whl.contains("aggregate(sequence("), whl)
    // while rejections keep reference-style text
    assert(rejects(
      "int i = 0; int s = 0; while (i < n) s += i; return s;",
      "n" -> CqlInt).contains("must be braced"))
    assert(rejects(
      "int i = 0; int s = 0; while (i < n) { s += i; } return s;",
      "n" -> CqlInt).contains("step their variable"))
    assert(rejects(
      "int i = 0; int s = 1; while (i < s) { s += i; i++; } return s;",
      "n" -> CqlInt).contains("data-dependent"))
    assert(rejects(
      "int i = 0; while (i < i + 3) { i++; } return i;",
      "n" -> CqlInt).contains("data-dependent"))
    assert(rejects(
      "int s = 0; while (n < 5) { s += 1; } return s;",
      "n" -> CqlInt).contains("declared before the loop") ||
      rejects("int s = 0; while (n < 5) { s += 1; } return s;",
        "n" -> CqlInt).contains("declared int or long"))
    // a while nested in a counted loop body keeps the not-supported
    // diagnostic, not a misleading "unknown identifier 'while'"
    assert(rejects(
      "int s = 0; for (int i = 0; i < n; i++) { while (s < 5) { s += 1; } } return s;",
      "n" -> CqlInt).contains("not supported"))
    // a while in a BRANCH whose variable lives outside it would have the
    // post-loop rebind discarded by the branch-exit restore — reject,
    // never return the pre-loop value
    assert(rejects(
      "int i = 0; if (n > 0) { while (i < 3) { i++; } } return i;",
      "n" -> CqlInt).contains("same block"))
    // fractional loop bounds would iterate one short of Java through the
    // BIGINT cast — reject for both loop forms
    assert(rejects(
      "int s = 0; for (int i = 0; i < d; i++) s += 1; return s;",
      "d" -> CqlDouble).contains("bound must be integral"))
    assert(rejects(
      "int i = 0; while (i < d) { i++; } return i;",
      "d" -> CqlDouble).contains("bound must be integral"))

    // nested branches (r13 rung) lower to nested IF() terms
    val nested = tr(
      "int s = 0; for (int i = 0; i < n; i++) { if (i > 2) { if (i > 4) s += i; else s += 100; } } return s;",
      "n" -> CqlInt)
    assert(nested.contains("aggregate(sequence(") &&
      "IF\\(".r.findAllIn(nested).size >= 2, nested)
    // validation still applies inside branches
    assert(rejects(
      "int s = 0; for (int i = 0; i < n; i++) { if (i > 2) { int j = i; s += j; } } return s;",
      "n" -> CqlInt).contains("declarations inside a counted loop"))
  }
}
