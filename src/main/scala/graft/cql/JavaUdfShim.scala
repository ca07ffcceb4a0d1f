package graft.cql

import graft.cql.Ast._

/** `LANGUAGE java` UDF translation shim.
  *
  * The reference compiles arbitrary sandboxed Java source per function
  * (`cql3/functions/JavaBasedUDFunction.java:1-696`, javassist-built class
  * around the body). A Spark-side engine gains nothing from interpreting
  * Java per row — the right execution shape is a Spark SQL expression that
  * inlines into whole-stage codegen like every `LANGUAGE spark` body. So
  * this shim translates the realistic body shapes — single
  * `return <expression>;` statements (most UDFs in the reference's
  * validation suite, `test/unit/.../entities/UFTest.java` et al., are this
  * shape), plus local-variable declarations, `if`/`else` chains, and
  * counted `for` loops whose body accumulates into one local (the
  * UFTest.java:441 StringBuilder repeat shape, lowered to
  * `aggregate(sequence(lo, hi), init, fold)`) — into the equivalent Spark
  * SQL, and rejects anything beyond that surface (do, try, free-form
  * assignment, data-dependent loops) with the reference's error text
  * (`Could not compile function '<name>' from Java source: ...`).
  *
  * Translated surface (typed bottom-up from the declared argument types, so
  * Java's string-concatenation overload of `+` resolves correctly):
  *  - literals: int/long(L)/double(d|decimal)/float(f), "str", 'c', null,
  *    true/false
  *  - arguments by name; parenthesized expressions
  *  - `+ - * / %`, comparisons, `&& || !`, ternary `c ? a : b`
  *  - `x == null` / `x != null` → IS [NOT] NULL
  *  - string `+` concat (any String operand stringifies the other side,
  *    null prints "null" — Java `String.valueOf` semantics)
  *  - boxing `Integer/Long/Double/Float/Short/Byte/Boolean/String.valueOf`
  *    and unboxing `.intValue()/.longValue()/.doubleValue()/...` → CAST
  *  - `Math.*` (sin cos tan asin acos atan sqrt cbrt exp log log10 pow abs
  *    floor ceil signum copySign round; min/max with Java's NaN
  *    propagation and null poisoning rather than least/greatest skipping)
  *  - statements: `[final] Type x = expr;` declarations (block-scoped,
  *    initializers inline), `if`/`else if`/`else`, `return` — with javac's
  *    definite-return and unreachable-code rules
  *  - `Integer.parseInt` / `Long.parseLong` / `Double.parseDouble` /
  *    `Float.parseFloat` / `Short.parseShort` / `Byte.parseByte` /
  *    `Boolean.parseBoolean` (Java string grammars pinned: parseInt's
  *    sign+digits-only via a regex guard, overflow → poison), and the
  *    tolerant-parse `try { return X.parseY(s); } catch (E e) { return
  *    <expr>; }` lowered to one COALESCE — sound because those calls
  *    null exactly when Java throws; general try bodies reject
  *  - array locals as literal lookup tables: `[final] T[] t = {…};` /
  *    `= new T[]{…};` with element-type conversion like javac, `t[i]`
  *    reads (0-based; OOB raises like Java's AIOOBE via `raise_error`,
  *    null index nulls), and `t.length` as a parse-time constant; sized
  *    allocation (`new T[n]`) and element writes reject — they need
  *    mutation the shim does not model
  *  - `switch` in the RETURN-ARM form (every arm a single
  *    `return <expr>;`, literal case labels, shared labels via
  *    fall-through INTO a body, optional `default`) — lowered to the
  *    equality `if` chain; `break`/statement arms reject
  *  - counted `for` loops: `for (int i = A; i </<= B; i++)` with a body of
  *    accumulation statements (`x = ...`, `x += ...`, `sb.append(...)`)
  *    into same-block locals — optionally guarded by one level of
  *    `if (cond) <accum>; [else <accum>;]` whose condition evaluates per
  *    iteration and may read the accumulators — lowered to an
  *    `aggregate(sequence)` fold (a scalar fold for one accumulator, a
  *    `named_struct` fold threading all of them for several);
  *    `StringBuilder` declarations and `.append` chains; declared-type
  *    conversion applied per statement, like javac
  *  - `e.toString()`, `new String(blobArg)` → CAST AS STRING
  *  - `String` methods on string-typed receivers: length isEmpty
  *    toLowerCase toUpperCase trim concat contains startsWith endsWith
  *    indexOf (0-based, -1 on miss) replace substring (0-based, end
  *    exclusive) equals equalsIgnoreCase
  *  - `m.get(k)` on map args (absent key → null, like Java `Map.get`),
  *    `l.get(i)` on list args (0-based)
  *  - `udt.getString/getInt/getLong/getDouble/getFloat/getBoolean("f")`
  *    field access on UDT args
  */
object JavaUdfShim {

  final case class Untranslatable(detail: String) extends Exception(detail)

  /** Translate `body` (a Java method body) to a Spark SQL expression over
    * the named arguments. Accepted statement surface: local variable
    * declarations (`[final] Type x = expr;` — pure, so each use inlines its
    * initializer; Spark's codegen subexpression elimination dedupes),
    * `if`/`else if`/`else` chains (lowered to nested `IF(...)` at the
    * statement join points), `return expr;`, counted loops, return-arm
    * `switch`, array-literal locals, and tolerant-parse `try`/`catch`.
    * Every path must return — the same definite-return rule javac
    * enforces — and uncounted loops / general try / assignment reject
    * with reference-style compile-error text. Throws [[Untranslatable]]
    * on anything outside this surface.
    */
  def translate(body: String, args: Seq[(String, CqlType)]): String = {
    val argTypes = args.toMap
    val toks = tokenize(body.trim)
    if (toks.isEmpty) throw Untranslatable("empty function body")
    val p = new Parser(toks, argTypes)
    val stmts = p.parseStmts()
    p.expectEnd()
    p.lower(stmts, None) match {
      // a char-typed result can only be declared with a numeric CQL
      // return (CQL has no char type; Java widens char to int there) —
      // emit the code point so the engine's final CAST lands on a number
      case Some((sql, TChar)) => s"ascii($sql)"
      case Some((sql, _)) => sql
      case None => throw Untranslatable(
        "missing return statement: not every path through the body returns " +
          "a value")
    }
  }

  // ── shim-internal value typing (drives + overload resolution) ───────
  private sealed trait T
  private case object TStr extends T
  /** Java `char`: carried as a 1-char STRING so equality/relational
    * compare lexicographically (identical to code-point order for single
    * chars), and converted to its code point with `ascii(...)` wherever
    * Java would widen char to int — arithmetic, numeric comparisons,
    * numeric declarations, and a top-level return (CQL has no char type,
    * so a char-returning body can only be declared with a numeric CQL
    * return, where Java widens).
    */
  private case object TChar extends T
  private final case class TNum(integral: Boolean) extends T
  private case object TBool extends T
  private case object TNull extends T
  private final case class TMap(value: CqlType) extends T
  private final case class TList(elem: CqlType) extends T
  private final case class TUdtT(udt: CqlUdt) extends T
  /** A local Java array (`int[] t = {…}`): element shim type, the
    * declared element SQL type (each initializer converts through it,
    * like scalar declarations), and the statically-known length —
    * arrays here are parse-time literals, the lookup-table shape UDF
    * bodies actually use.
    */
  private final case class TArr(elem: T, elemSql: String, n: Int) extends T
  private case object TOther extends T

  private def ofCql(t: CqlType): T = t match {
    case CqlText | CqlAscii => TStr
    case CqlInt | CqlBigint | CqlSmallint | CqlTinyint | CqlVarint |
         CqlCounter => TNum(integral = true)
    case CqlDouble | CqlFloat | CqlDecimal => TNum(integral = false)
    case CqlBoolean => TBool
    case m: CqlMap => TMap(m.value)
    case l: CqlList => TList(l.elem)
    case s: CqlSet => TList(s.elem)
    case u: CqlUdt => TUdtT(u)
    case _ => TOther
  }

  // ── tokens ──────────────────────────────────────────────────────────
  private sealed trait Tok
  private final case class Ident(s: String) extends Tok
  private final case class NumLit(sql: String, integral: Boolean) extends Tok
  private final case class StrLit(sql: String) extends Tok
  /** Java char literal ('x'): single-quoted, exactly one char after
    * escape processing. Multi-char single-quoted text keeps tokenizing as
    * a (lenient) string literal, as before.
    */
  private final case class CharLit(sql: String) extends Tok
  private final case class Op(s: String) extends Tok

  private def tokenize(s: String): List[Tok] = {
    val out = scala.collection.mutable.ListBuffer.empty[Tok]
    var i = 0
    def err(msg: String) = throw Untranslatable(s"$msg (at offset $i)")
    while (i < s.length) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c.isLetter || c == '_') {
        val j = i
        while (i < s.length && (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_')) i += 1
        out += Ident(s.substring(j, i))
      } else if (c.isDigit || (c == '.' && i + 1 < s.length && s.charAt(i + 1).isDigit)) {
        val j = i
        while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '.')) i += 1
        val digits = s.substring(j, i)
        val suffix = if (i < s.length) s.charAt(i) match {
          case 'd' | 'D' => i += 1; "d"
          case 'f' | 'F' => i += 1; "f"
          case 'l' | 'L' => i += 1; "l"
          case _ => ""
        } else ""
        val isFractional = digits.contains('.')
        val (sql, integral) = suffix match {
          case "d" => (s"CAST($digits AS DOUBLE)", false)
          case "f" => (s"CAST($digits AS FLOAT)", false)
          case "l" => (s"${digits}L", true)
          // Java fractional literals are double; Spark's bare decimals are
          // DECIMAL — cast to keep Java arithmetic semantics
          case _ if isFractional => (s"CAST($digits AS DOUBLE)", false)
          case _ => (digits, true)
        }
        out += NumLit(sql, integral)
      } else if (c == '"' || c == '\'') {
        val quote = c
        val sb = new StringBuilder
        i += 1
        var closed = false
        while (i < s.length && !closed) {
          val ch = s.charAt(i)
          if (ch == '\\' && i + 1 < s.length) {
            s.charAt(i + 1) match {
              case 'n' => sb += '\n'; case 't' => sb += '\t'; case 'r' => sb += '\r'
              case other => sb += other
            }
            i += 2
          } else if (ch == quote) { closed = true; i += 1 }
          else { sb += ch; i += 1 }
        }
        if (!closed) err("unterminated string literal")
        val sql = "'" + sb.result().replace("'", "''") + "'"
        if (quote == '\'' && sb.length == 1) out += CharLit(sql)
        else out += StrLit(sql)
      } else {
        val two = if (i + 1 < s.length) s.substring(i, i + 2) else ""
        if (Set("==", "!=", "<=", ">=", "&&", "||").contains(two)) { out += Op(two); i += 2 }
        else { out += Op(c.toString); i += 1 }
      }
    }
    out.toList
  }

  // statement mini-AST: declarations resolve at parse time (the initializer
  // inlines into the environment), so only control flow survives to lowering
  private sealed trait Stmt
  private final case class SRet(e: (String, T)) extends Stmt
  private final case class SIf(cond: String, thn: List[Stmt], els: List[Stmt]) extends Stmt

  // ── recursive-descent over the Java expression grammar ──────────────
  private final class Parser(var toks: List[Tok], argTypes: Map[String, CqlType]) {
    private def fail(msg: String): Nothing = throw Untranslatable(msg)
    private def peek: Option[Tok] = toks.headOption
    private def next(): Tok = toks match {
      case h :: t => toks = t; h
      case Nil => fail("unexpected end of expression")
    }
    private def eat(op: String): Unit = next() match {
      case Op(`op`) =>
      case other => fail(s"expected '$op', found $other")
    }
    def expectEnd(): Unit =
      if (toks.nonEmpty) fail(s"trailing tokens after expression: $toks")

    // ── statement layer ───────────────────────────────────────────────
    /** Locals in scope: name → (inlined initializer SQL, shim type). Blocks
      * save/restore around their body so declarations stay block-scoped.
      */
    private var locals: Map[String, (String, T)] = Map.empty
    /** Scope bookkeeping for the counted-loop translation: a loop may only
      * accumulate into a local declared at the loop's own block depth —
      * branch exits restore [[locals]], so a mutation of an outer-scope
      * variable from inside a branch would silently vanish instead of
      * translating wrong.
      */
    private var scopeDepth = 0
    private var declDepth: Map[String, Int] = Map.empty
    /** Declared SQL type per local (accumulator casts keep Java's
      * declared-type arithmetic through the fold).
      */
    private var declSqlType: Map[String, String] = Map.empty
    /** Locals declared as StringBuilder — the only receivers `.append` is
      * legal on.
      */
    private var sbLocals: Set[String] = Set.empty

    /** Fold lambda variables of counted loops currently being lowered —
      * a NESTED loop must pick a fresh name: re-using an enclosing fold's
      * variable would capture the inner lambda's accumulator where the
      * init expressions mean the outer one.
      */
    private var activeFoldVars: Set[String] = Set.empty

    private val declTypes: Map[String, Option[(String, T)]] = Map(
      "int" -> Some(("INT", TNum(integral = true))),
      "long" -> Some(("BIGINT", TNum(integral = true))),
      "short" -> Some(("SMALLINT", TNum(integral = true))),
      "byte" -> Some(("TINYINT", TNum(integral = true))),
      "double" -> Some(("DOUBLE", TNum(integral = false))),
      "float" -> Some(("FLOAT", TNum(integral = false))),
      "boolean" -> Some(("BOOLEAN", TBool)),
      "Integer" -> Some(("INT", TNum(integral = true))),
      "Long" -> Some(("BIGINT", TNum(integral = true))),
      "Short" -> Some(("SMALLINT", TNum(integral = true))),
      "Byte" -> Some(("TINYINT", TNum(integral = true))),
      "Double" -> Some(("DOUBLE", TNum(integral = false))),
      "Float" -> Some(("FLOAT", TNum(integral = false))),
      "Boolean" -> Some(("BOOLEAN", TBool)),
      "String" -> Some(("STRING", TStr)),
      "char" -> Some(("STRING", TChar)),
      "Character" -> Some(("STRING", TChar)),
      // StringBuilder is a String with value semantics here: the shim only
      // admits mutation through counted-loop accumulation, which the fold
      // translation threads explicitly
      "StringBuilder" -> Some(("STRING", TStr)),
      // `var`/`final var`: no conversion, the initializer's type stands
      "var" -> None)

    // "while" stays here for the LOOP-BODY diagnostic (a while nested in
    // a counted loop gets "not supported", not "unknown identifier") —
    // top-level whiles never reach this set: parseStmt matches them first
    private val rejectedKeywords = Set(
      "while", "do", "try", "switch", "throw", "synchronized")

    def parseStmts(): List[Stmt] = {
      val out = scala.collection.mutable.ListBuffer.empty[Stmt]
      while (toks.nonEmpty && !peek.contains(Op("}")))
        parseStmt().foreach(out += _)
      out.toList
    }

    /** One statement; None for a declaration (absorbed into [[locals]]). */
    private def parseStmt(): Option[Stmt] = toks match {
      case Ident("return") :: _ =>
        next()
        val e = expression()
        eat(";")
        Some(SRet(e))
      case Ident("if") :: _ =>
        next(); eat("(")
        val (c, _) = expression()
        eat(")")
        val thn = parseBranch()
        val els = peek match {
          case Some(Ident("else")) => next(); parseBranch()
          case _ => Nil
        }
        Some(SIf(c, thn, els))
      case Ident("for") :: _ =>
        next(); parseFor(); None
      case Ident("while") :: _ =>
        next(); parseWhile(); None
      case Ident("switch") :: _ =>
        next(); Some(parseSwitch())
      case Ident("try") :: _ =>
        next(); Some(parseTryCatch())
      case Ident(kw) :: _ if rejectedKeywords.contains(kw) =>
        fail(s"'$kw' statements are not supported by this engine's " +
          "translation shim (declarations, if/else, counted for/while " +
          "loops, return-arm switch and return only; rewrite the function " +
          "as LANGUAGE spark for anything larger)")
      case Ident("final") :: Ident(t) :: Op("[") :: _ if declTypes.contains(t) =>
        next(); parseArrayDecl(); None
      case Ident("final") :: _ =>
        next(); parseDecl(); None
      case Ident(t) :: Op("[") :: Op("]") :: Ident(_) :: _ if declTypes.contains(t) =>
        parseArrayDecl(); None
      case Ident(t) :: Ident(_) :: _ if declTypes.contains(t) =>
        parseDecl(); None
      case Ident(n) :: Op("=") :: _ if locals.contains(n) || argTypes.contains(n) =>
        fail("assignment statements are not supported by this engine's " +
          "translation shim (locals are single-assignment; use a new " +
          "declaration or a ternary)")
      case t :: _ => fail(s"unsupported statement starting at $t (declarations, " +
        "if/else and return only)")
      case Nil => fail("unexpected end of body")
    }

    /** `switch` in its RETURN-ARM form — the shape UDF dispatch tables
      * take in practice: every arm (and the optional `default`) is a
      * single `return <expr>;`, case labels are literal constants
      * (optionally negated numbers, chars, strings), and consecutive
      * labels share the following arm (Java fall-through INTO a body;
      * fall-through ACROSS statement bodies, `break`, and statement arms
      * reject loudly — they need mutation the shim doesn't model). The
      * lowering is the equality-based `if`/`else if` chain, so a switch
      * with no `default` falls out to the statements after it, exactly
      * like Java. Selector equality follows the `==` operator's rules
      * (char↔int numeric promotion; String `switch` compares by value,
      * Java's `.equals`). Null handling keeps the shim's convention for
      * `if`: a null selector matches no case and lands in `default` /
      * after the switch (Java would NPE unboxing it).
      */
    private def parseSwitch(): Stmt = {
      eat("(")
      val sel = expression()
      eat(")")
      sel._2 match {
        case TNum(true) | TChar | TStr => ()
        case TNum(false) => fail("switch on a floating-point selector is " +
          "not legal Java (byte/short/char/int, their boxes, String or " +
          "enum only)")
        case _ => fail("switch selector must be an integral, char or " +
          "String expression")
      }
      eat("{")
      def caseLabel(): (String, T) = toks match {
        case Op("-") :: NumLit(sql, integral) :: rest =>
          toks = rest; (s"(- $sql)", TNum(integral))
        case NumLit(sql, integral) :: rest => toks = rest; (sql, TNum(integral))
        case StrLit(sql) :: rest => toks = rest; (sql, TStr)
        case CharLit(sql) :: rest => toks = rest; (sql, TChar)
        case t :: _ => fail(s"switch case labels must be literal constants, found $t")
        case Nil => fail("unexpected end of body inside switch")
      }
      val arms = scala.collection.mutable.ListBuffer.empty[(List[(String, T)], List[Stmt])]
      var defaultBody: Option[List[Stmt]] = None
      // javac rejects duplicate case labels at compile time (char and int
      // labels that convert to the same value count as duplicates); compare
      // by converted constant value, not by surface SQL text
      val seenLabels = scala.collection.mutable.Set.empty[String]
      def labelKey(sql: String, t: T): String = t match {
        case TChar =>
          val inner = sql.substring(1, sql.length - 1).replace("''", "'")
          "n:" + inner.charAt(0).toInt
        case TNum(true) =>
          val neg = sql.startsWith("(- ")
          val core = (if (neg) sql.stripPrefix("(- ").stripSuffix(")") else sql)
            .stripSuffix("L")
          try { "n:" + (if (neg) -core.toLong else core.toLong) }
          catch { case _: NumberFormatException => "x:" + sql }
        case _ => "s:" + sql
      }
      while (!peek.contains(Op("}"))) {
        val labels = scala.collection.mutable.ListBuffer.empty[(String, T)]
        var isDefault = false
        var labeling = true
        while (labeling) {
          toks match {
            case Ident("case") :: _ =>
              next()
              val lbl = caseLabel()
              (sel._2, lbl._2) match {
                case (TNum(_), TNum(_)) | (TNum(_), TChar) | (TChar, TNum(_)) |
                     (TChar, TChar) | (TStr, TStr) => ()
                case _ => fail(s"switch case label ${lbl._1} is not " +
                  "assignment-compatible with the selector (Java rejects " +
                  "this at compile time)")
              }
              if (!seenLabels.add(labelKey(lbl._1, lbl._2)))
                fail(s"duplicate case label ${lbl._1} in switch")
              labels += lbl
              eat(":")
            case Ident("default") :: _ =>
              next(); eat(":")
              if (defaultBody.isDefined) fail("duplicate default label in switch")
              isDefault = true
            case _ => labeling = false
          }
        }
        if (labels.isEmpty && !isDefault)
          fail(s"expected 'case' or 'default' inside switch, found ${peek.getOrElse("}")}")
        val body = toks match {
          case Ident("return") :: _ =>
            next()
            val e = expression()
            eat(";")
            List(SRet(e): Stmt)
          case _ => fail("switch arms must each be a single 'return " +
            "<expr>;' in this shim (break, statement bodies and " +
            "fall-through across bodies need mutation it doesn't model; " +
            "rewrite the function as LANGUAGE spark)")
        }
        if (labels.nonEmpty) arms += ((labels.toList, body))
        if (isDefault) defaultBody = Some(body)
      }
      eat("}")
      if (arms.isEmpty && defaultBody.isEmpty)
        fail("empty switch (no case or default arms)")
      def armCond(labels: List[(String, T)]): String =
        labels.map { lbl =>
          val (l, r) = charVsNum(sel, lbl)
          s"(${l._1} = ${r._1})"
        }.mkString("(", " OR ", ")")
      // all arms return, so arm order vs default position is immaterial:
      // the chain tests every case and falls to default (or out) last
      val chain = arms.toList.foldRight(defaultBody.getOrElse(Nil)) {
        case ((labels, body), els) => List(SIf(armCond(labels), body, els): Stmt)
      }
      chain match {
        case single :: Nil => single
        case _ => // default-only switch: its single SRet is the statement
          chain.headOption.getOrElse(fail("empty switch"))
      }
    }

    private def parseDecl(): Unit = {
      val declType = next() match {
        case Ident(t) if declTypes.contains(t) => declTypes(t)
        case Ident(t) => fail(s"unsupported declaration type '$t' (primitives, " +
          "their boxes, String and var only)")
        case other => fail(s"expected a type name, found $other")
      }
      val name = next() match {
        case Ident(n) => n
        case other => fail(s"expected a variable name, found $other")
      }
      if (locals.contains(name) || argTypes.contains(name))
        fail(s"variable '$name' is already defined")
      eat("=")
      val isSb = toks match {
        case Ident("new") :: Ident("StringBuilder") :: _ => true
        case _ => false
      }
      val (sql, t) = expression()
      eat(";")
      // the declared type is a real conversion in Java (int x = …; double y
      // = intExpr;) — keep it so later arithmetic resolves like Java's.
      // char crossings are where a silent CAST would lie: char→numeric is
      // Java's code-point widening (ascii), numeric→char / char→String /
      // char→boolean don't compile in Java — reject rather than emit a
      // string-shaped cast that NULLs or stringifies at run time
      val bound = (declType, t) match {
        case (Some((sqlT, dt @ TNum(_))), TChar) =>
          (s"CAST((ascii($sql)) AS $sqlT)", dt)
        case (Some((_, TChar)), it) if it != TChar && it != TNull =>
          fail(s"char declarations accept only char-typed initializers " +
            s"(got ${tName(it)}; Java narrows to char only on constant " +
            "expressions, which this shim does not model)")
        case (Some((_, TStr)), TChar) =>
          fail("a char initializer is not assignable to a String " +
            "declaration in Java (use String.valueOf or concatenation)")
        case (Some((_, TBool)), TChar) =>
          fail("a char initializer is not assignable to a boolean declaration")
        case (Some((sqlT, dt)), _) => (s"CAST(($sql) AS $sqlT)", dt)
        case (None, _) => (s"($sql)", t)
      }
      locals = locals.updated(name, bound)
      declDepth = declDepth.updated(name, scopeDepth)
      declSqlType = declSqlType.updated(name, declType match {
        case Some((sqlT, _)) => sqlT
        case None => t match { // var: infer the fold type from the initializer
          case TStr => "STRING"
          case TBool => "BOOLEAN"
          case TNum(true) => "BIGINT"
          case TNum(false) => "DOUBLE"
          case _ => "STRING"
        }
      })
      if (isSb) sbLocals += name
    }

    /** `try { return X.parseY(s); } catch (AnyException e) { return
      * <expr>; }` — THE tolerant-parse shape real UDF bodies use. Sound
      * because a parse call's SQL form is NULL exactly when the Java
      * call throws (the guard regex pins parseInt's grammar; CAST
      * overflow nulls where Java overflows; a null input throws in Java
      * and nulls in SQL), so "took the catch branch" agrees between the
      * engines, and the lowering is one COALESCE. GENERAL try bodies
      * reject loudly: any expression that can be null WITHOUT a Java
      * exception (a bare nullable arg, Map.get on an absent key, a null
      * literal behind a ternary) would take the SQL catch branch where
      * Java happily returns null.
      */
    private def parseTryCatch(): Stmt = {
      eat("{")
      toks match {
        case Ident("return") :: Ident(cls) :: Op(".") :: Ident(m) :: Op("(") :: _
            if parseStatics.get(cls).contains(m) => ()
        case _ => fail("try blocks are supported only in the tolerant-parse " +
          "form 'try { return Integer.parseInt(...); } catch " +
          "(SomeException e) { return <expr>; }' — general exception flow " +
          "needs runtime machinery this shim does not model; rewrite the " +
          "function as LANGUAGE spark")
      }
      // the soundness argument ("SQL NULL exactly when Java throws") covers
      // ONLY the bare parse call: a trailing operator — parseInt(s)/d,
      // parseInt(s)+x.length() — can throw in Java for reasons the parse
      // grammar never models (ArithmeticException, NullPointerException),
      // and SQL would take the catch arm where Java propagates. Require the
      // try body to be EXACTLY the call: the token after its balanced ')'
      // must be the ';'.
      locally {
        @annotation.tailrec
        def afterCall(ts: List[Tok], depth: Int): List[Tok] = ts match {
          case Op("(") :: rest => afterCall(rest, depth + 1)
          case Op(")") :: rest =>
            if (depth == 1) rest else afterCall(rest, depth - 1)
          case _ :: rest => afterCall(rest, depth)
          case Nil => Nil
        }
        afterCall(toks.dropWhile(_ != Op("(")), 0) match {
          case Op(";") :: _ => ()
          case _ => fail("the try body must be exactly the parse call — an " +
            "operator applied to its result can throw in Java for reasons " +
            "the tolerant-parse lowering does not model (move the " +
            "arithmetic outside the try, or rewrite as LANGUAGE spark)")
        }
      }
      next() // 'return'
      val tryE = expression()
      eat(";"); eat("}")
      toks match {
        case Ident("catch") :: _ => next()
        case _ => fail("try without catch (finally alone is not supported)")
      }
      eat("(")
      next() match {
        case Ident(_) => ()
        case other => fail(s"expected an exception type in catch, found $other")
      }
      var closed = false
      while (!closed) toks match {
        case Op(".") :: Ident(_) :: _ => next(); next() // dotted exception name
        case Op("|") :: _ => fail("multi-catch is not supported by this " +
          "engine's translation shim (one catch clause only)")
        case Ident(_) :: Op(")") :: _ => next(); closed = true
        case other => fail(s"malformed catch parameter near $other")
      }
      eat(")")
      eat("{")
      toks match {
        case Ident("return") :: _ => next()
        case _ => fail("catch blocks must be a single 'return <expr>;'")
      }
      val catchE = expression()
      eat(";"); eat("}")
      // both arms feed the same Java return type; cross-kind arms are a
      // compile error there too (a char catch widens into a numeric try
      // via its code point, Java's char→int conversion)
      val catchSql = (tryE._2, catchE._2) match {
        case (_, TNull) => catchE._1
        case (TNum(_), TChar) => s"ascii(${catchE._1})"
        case (TNum(_), TNum(_)) | (TStr, TStr) | (TBool, TBool) => catchE._1
        case _ => fail(s"catch arm of ${tName(catchE._2)} type is not " +
          s"assignment-compatible with the try arm's ${tName(tryE._2)} result")
      }
      val t = if (tryE._2 == TNull) catchE._2 else tryE._2
      SRet((s"COALESCE(${tryE._1}, $catchSql)", t))
    }

    /** `int[] t = {…};` / `= new int[]{…};` — Java array locals as
      * parse-time literal lookup tables (the dispatch-table shape real
      * UDF bodies use). Initializer elements convert through the
      * declared element type exactly like scalar declarations (char
      * widens into numeric arrays via its code point; anything else
      * cross-kind rejects as javac would). SIZED allocation
      * (`new int[n]`) and element assignment reject loudly — they need
      * the mutation this shim does not model — so every array's length
      * is statically known at translation time.
      */
    private def parseArrayDecl(): Unit = {
      val (elemSql, elemT) = next() match {
        case Ident(t) => declTypes(t) match {
          case Some(p) => p
          case None => fail("'var[]' is not a Java declaration")
        }
        case other => fail(s"expected a type name, found $other")
      }
      eat("["); eat("]")
      val name = next() match {
        case Ident(n) => n
        case other => fail(s"expected a variable name, found $other")
      }
      if (locals.contains(name) || argTypes.contains(name))
        fail(s"variable '$name' is already defined")
      eat("=")
      toks match {
        case Ident("new") :: _ =>
          next()
          next() match {
            case Ident(t2) if declTypes.get(t2).flatten.exists(_._1 == elemSql) => ()
            case other => fail(s"array constructor element type $other " +
              "does not match the declaration")
          }
          eat("[")
          if (!peek.contains(Op("]")))
            fail("sized array allocation (new T[n]) is not supported by " +
              "this engine's translation shim (the elements would need " +
              "assignment statements; use an initializer list or rewrite " +
              "the function as LANGUAGE spark)")
          eat("]")
        case _ => ()
      }
      eat("{")
      val elems = scala.collection.mutable.ListBuffer.empty[String]
      if (!peek.contains(Op("}"))) {
        def one(): Unit = {
          val (sql, t) = expression()
          elems += ((elemT, t) match {
            case (TNum(_), TChar) => s"CAST((ascii($sql)) AS $elemSql)"
            case (TNum(_), TNum(_)) => s"CAST(($sql) AS $elemSql)"
            case (TChar, TChar) | (TStr, TStr) | (TBool, TBool) => sql
            case (_, other) => fail(s"array element of ${tName(other)} type " +
              s"is not assignment-compatible with the $elemSql element " +
              "declaration (Java rejects this at compile time)")
          })
        }
        one()
        while (peek.contains(Op(","))) { next(); one() }
      }
      eat("}")
      eat(";")
      if (elems.isEmpty)
        fail("empty array initializers are not supported (no element " +
          "assignment exists to fill one; rewrite as LANGUAGE spark)")
      locals = locals.updated(name,
        (s"ARRAY(${elems.mkString(", ")})", TArr(elemT, elemSql, elems.length)))
      declDepth = declDepth.updated(name, scopeDepth)
    }

    private def parseBranch(): List[Stmt] = peek match {
      case Some(Op("{")) =>
        next()
        val saved = (locals, declDepth, declSqlType, sbLocals)
        scopeDepth += 1
        val ss = parseStmts()
        eat("}")
        scopeDepth -= 1
        locals = saved._1; declDepth = saved._2
        declSqlType = saved._3; sbLocals = saved._4
        ss
      case _ =>
        // classify BEFORE consuming: parseStmt returns None for both
        // declarations and for-loops, and the two need different error
        // text (a sole-statement for-loop's accumulation would be
        // silently discarded by the branch-exit locals restore)
        val isLoop = toks match {
          case Ident("for" | "while") :: _ => true
          case _ => false
        }
        parseStmt() match {
          case Some(s) => List(s)
          case None if isLoop => fail("a loop cannot be the sole " +
            "statement of a branch: its accumulation would not survive the " +
            "branch (brace the branch and declare the accumulator inside it, " +
            "or restructure with a ternary)")
          case None => fail("a declaration cannot be the sole statement of a branch")
        }
    }

    // ── counted-loop translation ──────────────────────────────────────
    /** `for (int i = A; i < B; i++) <accumulation>` — the UFTest.java:441
      * shape (`cassandra/test/unit/org/apache/cassandra/cql3/validation/
      * entities/UFTest.java:441`: StringBuilder repeat-append). The loop
      * must be a counted ascending scan (`<`/`<=` bound, `i++`/`++i`/
      * `i += 1`/`i = i + 1` step) whose body folds into locals declared at
      * the loop's own scope depth. One accumulator lowers exactly to
      *   IF(upper < lower, init,
      *      aggregate(sequence(lower, upper), init, (acc, i) -> step))
      * and several lower to ONE `named_struct` fold threading them all
      * (each post-loop value is a field of the CSE-deduped fold) — in both
      * forms every statement casts to its accumulator's declared Java type
      * so int/long/double arithmetic and per-statement narrowing resolve
      * like javac's. NESTED counted loops lower recursively: the inner
      * loop's fold (whose bounds may read the outer loop variable and
      * accumulators — they evaluate inside the outer lambda, which is
      * exactly Java's per-iteration re-evaluation) becomes one statement
      * of the outer body, rebinding the accumulators it threads; its
      * fold variable is chosen fresh against every enclosing fold's
      * ([[activeFoldVars]]). Anything else — while, decrementing or
      * data-dependent loops, loops inside a loop's if-branch, mutation
      * of an outer-branch local (which the branch-exit restore would
      * silently discard) — rejects with the shim's compile-error text,
      * exactly as before. Returns the accumulator set the loop threads
      * (the enclosing loop, if any, folds them into its own).
      */
    private def parseFor(): Seq[String] = {
      eat("(")
      next() match {
        case Ident("int") | Ident("long") =>
        case other => fail("only counted 'for (int i = ...; i < bound; i++)' " +
          s"loops translate; found loop variable type $other")
      }
      val lv = next() match {
        case Ident(n) => n
        case other => fail(s"expected a loop variable name, found $other")
      }
      if (locals.contains(lv) || argTypes.contains(lv))
        fail(s"variable '$lv' is already defined")
      eat("=")
      val (lo, loT) = expression()
      // javac rejects a lossy `int i = <double>` init; translating it
      // would silently truncate the starting point
      loT match {
        case TNum(true) | TNull =>
        case t => fail(s"counted-loop start must be integral, got ${tName(t)}")
      }
      eat(";")
      next() match {
        case Ident(`lv`) =>
        case other => fail(s"counted-loop condition must test '$lv', found $other")
      }
      val cmp = next() match {
        case Op("<") => "<"
        case Op("<=") => "<="
        case other => fail("counted-loop condition must be an ascending " +
          s"'<' or '<=' bound, found $other")
      }
      // keep the bound's raw identifiers: Java re-evaluates the condition
      // every iteration, so a bound that reads the accumulator is a
      // data-dependent loop — the fold (which snapshots the bound once)
      // would translate it with silently wrong semantics. Rejected below
      // once the accumulator is known.
      val boundStart = toks
      val (hi, hiT) = expression()
      // a fractional bound iterates differently than the BIGINT cast in
      // the fold (Java runs `i < 2.5` through i = 2; the cast would stop
      // at 1) — reject rather than silently iterate one short
      hiT match {
        case TNum(true) | TNull =>
        case t => fail(s"counted-loop bound must be integral, got ${tName(t)}")
      }
      val boundIdents =
        boundStart.take(boundStart.length - toks.length)
          .collect { case Ident(n) => n }.toSet
      eat(";")
      // any POSITIVE constant step translates (sequence(lo, hi, k) walks
      // exactly Java's iterates); variable or non-positive steps reject
      def stepOf(sql: String): Option[Long] =
        sql.stripSuffix("L").toLongOption.filter(_ >= 1)
      val step: Long = toks match {
        case Ident(`lv`) :: Op("+") :: Op("+") :: Op(")") :: rest =>
          toks = Op(")") :: rest; 1L
        case Op("+") :: Op("+") :: Ident(`lv`) :: Op(")") :: rest =>
          toks = Op(")") :: rest; 1L
        case Ident(`lv`) :: Op("+") :: Op("=") :: NumLit(k, true) :: Op(")") :: rest
            if stepOf(k).isDefined =>
          toks = Op(")") :: rest; stepOf(k).get
        case Ident(`lv`) :: Op("=") :: Ident(`lv`) :: Op("+") :: NumLit(k, true) :: Op(")") :: rest
            if stepOf(k).isDefined =>
          toks = Op(")") :: rest; stepOf(k).get
        case _ => fail(s"counted-loop increment must step '$lv' by a positive " +
          "constant ('i++', '++i', 'i += k' or 'i = i + k' with integer k >= 1)")
      }
      eat(")")
      // collect the body's accumulation statements (single or braced)
      val braced = peek.contains(Op("{"))
      if (braced) next()
      val saved = (locals, declDepth, declSqlType, sbLocals)
      val seen = scala.collection.mutable.LinkedHashSet.empty[String]

      /** One accumulation statement at [[toks]]; returns the accumulator. */
      def parseSimpleAccum(): String = {
        val name = toks match {
          case Ident(n) :: _ => n
          case t :: _ => fail(s"unsupported loop-body statement starting at $t " +
            "(loop bodies may only contain accumulation statements)")
          case Nil => fail("unexpected end of loop body")
        }
        if (name == "for")
          fail("a for-loop inside a counted-loop branch is not supported " +
            "by this engine's translation shim (hoist the inner loop out " +
            "of the branch, or guard each accumulation with a ternary)")
        if (name == "return" || rejectedKeywords(name))
          fail(s"'$name' inside a counted loop is not supported by this " +
            "engine's translation shim (loop bodies may only contain " +
            "accumulation statements over same-block locals)")
        // a declaration's leading type name would otherwise fall through
        // to the misleading "unknown identifier 'int'" rejection below
        if (declTypes.contains(name) || name == "final")
          fail("declarations inside a counted loop are not supported by " +
            "this engine's translation shim (declare the accumulator in " +
            "the loop's own block and accumulate into it)")
        if (name == lv) fail("the loop variable cannot be reassigned")
        if (!locals.contains(name) && !saved._1.contains(name))
          fail(s"unknown identifier '$name' in loop body")
        if (!saved._2.get(name).contains(scopeDepth))
          fail(s"loop accumulation into '$name' is not supported: the " +
            "accumulator must be a local declared in the same block as " +
            "the loop itself")
        if (!seen.contains(name)) {
          if (boundIdents.contains(name))
            fail(s"the loop bound reads '$name', which the body " +
              "mutates — data-dependent loops are not supported by " +
              "this engine's translation shim")
          seen += name
        }
        parseAccumStmt(name)
        name
      }

      /** An if-branch inside the loop body: a braced run of accumulation
        * statements (each of which may itself be an `if` — branches nest
        * recursively) or a single one. Returns the updated accumulators.
        */
      def parseLoopBranch(): Seq[String] = {
        val updated = scala.collection.mutable.ListBuffer.empty[String]
        if (peek.contains(Op("{"))) {
          next()
          while (!peek.contains(Op("}"))) {
            toks match {
              case Ident("if") :: _ => updated ++= parseLoopIf()
              case Nil => fail("unexpected end of loop body")
              case _ => updated += parseSimpleAccum()
            }
          }
          eat("}")
        } else toks match {
          case Ident("if") :: _ => updated ++= parseLoopIf()
          case _ => updated += parseSimpleAccum()
        }
        updated.toSeq
      }

      /** `if (cond) <branch> [else <branch>]` inside the loop body: the
        * condition evaluates PER ITERATION at its statement position
        * (after earlier statements' updates — it may read accumulators,
        * unlike the loop bound, which Java snapshots only conceptually);
        * each branch threads from the same entry state, and accumulators
        * updated by either branch merge as IF(cond, then', else').
        * Branches may contain further `if`s — an inner if merges into
        * its branch's running state first, so nesting lowers to nested
        * IF() terms with Java's statement-order semantics. Returns the
        * accumulators either branch updated.
        */
      def parseLoopIf(): Seq[String] = {
        toks = toks.tail // 'if'
        eat("(")
        val (c, _) = expression()
        eat(")")
        val snap = locals
        val thenBind = parseLoopBranch().map(n => n -> locals(n)).toMap
        locals = snap
        val elseBind = peek match {
          case Some(Ident("else")) =>
            next(); parseLoopBranch().map(n => n -> locals(n)).toMap
          case _ => Map.empty[String, (String, T)]
        }
        locals = snap
        val touched = (thenBind.keySet ++ elseBind.keySet).toSeq.sorted
        touched.foreach { n =>
          val (tv, tt) = thenBind.getOrElse(n, snap(n))
          val (ev, _) = elseBind.getOrElse(n, snap(n))
          locals = locals.updated(n, (s"IF(($c), ($tv), ($ev))", tt))
        }
        touched
      }

      def parseLoopStmts(): Unit = {
        var done = false
        while (!done) {
          toks match {
            case Op("}") :: rest if braced => toks = rest; done = true
            case Nil => fail("unexpected end of loop body")
            case Ident("if") :: _ => parseLoopIf(); if (!braced) done = true
            case Ident("for") :: _ =>
              // nested counted loop: lower recursively; the accumulators
              // it threads are (same-block) accumulators of THIS loop too
              next()
              parseFor().foreach { a =>
                if (!seen.contains(a)) {
                  if (boundIdents.contains(a))
                    fail(s"the loop bound reads '$a', which the body " +
                      "mutates — data-dependent loops are not supported by " +
                      "this engine's translation shim")
                  seen += a
                }
              }
              if (!braced) done = true
            case _ => parseSimpleAccum(); if (!braced) done = true
          }
        }
      }

      // Two passes over the same body tokens: a multi-accumulator body
      // lowers to a STRUCT fold (named_struct per iteration), so every
      // accumulated local must be bound to its in-fold value —
      // `<lam>.name` — BEFORE the first statement's right-hand side is
      // parsed (statement 2 may read accumulator 1 and vice versa). The
      // discovery pass finds the accumulator set (same validation, wrong
      // bindings, output discarded); the real pass then parses with the
      // correct in-fold bindings. Single-accumulator bodies keep the
      // direct scalar fold (the lambda variable IS the accumulator).
      val bodyStart = toks
      locals = saved._1.updated(lv, (lv, TNum(integral = true)))
      parseLoopStmts()
      val accs = seen.toSeq
      val multi = accs.size > 1
      // fold lambda variable for the struct form — any free identifier
      val lamAcc = {
        var n = "fold_acc"
        while (saved._1.contains(n) || argTypes.contains(n) || n == lv ||
          activeFoldVars.contains(n)) n += "_"
        n
      }
      activeFoldVars += lamAcc
      toks = bodyStart
      seen.clear()
      locals = saved._1.updated(lv, (lv, TNum(integral = true)))
      accs.foreach { a =>
        locals = locals.updated(a, (if (multi) s"$lamAcc.$a" else a, saved._1(a)._2))
      }
      parseLoopStmts()
      locals = accs match {
        case Seq() => saved._1 // empty body: the loop is a no-op
        case Seq(a) =>
          val stepSql = locals(a)._1
          val t = saved._1(a)._2
          val sqlT = declSqlType.getOrElse(a, "STRING")
          val init = s"CAST((${saved._1(a)._1}) AS $sqlT)"
          val lower = s"CAST(($lo) AS BIGINT)"
          val upper =
            if (cmp == "<") s"(CAST(($hi) AS BIGINT) - 1L)"
            else s"CAST(($hi) AS BIGINT)"
          val seqStep = if (step == 1L) "" else s", ${step}L"
          val agg = s"IF($upper < $lower, $init, aggregate(sequence($lower, " +
            s"$upper$seqStep), $init, ($a, $lv) -> CAST(($stepSql) AS $sqlT)))"
          saved._1.updated(a, (agg, t))
        case _ =>
          // struct fold: one named_struct threads every accumulator; the
          // post-loop value of each is a field of the (CSE-deduped) fold
          def sqlTOf(a: String) = declSqlType.getOrElse(a, "STRING")
          val lower = s"CAST(($lo) AS BIGINT)"
          val upper =
            if (cmp == "<") s"(CAST(($hi) AS BIGINT) - 1L)"
            else s"CAST(($hi) AS BIGINT)"
          val initStruct = accs
            .map(a => s"'$a', CAST((${saved._1(a)._1}) AS ${sqlTOf(a)})")
            .mkString("named_struct(", ", ", ")")
          val stepStruct = accs
            .map(a => s"'$a', CAST((${locals(a)._1}) AS ${sqlTOf(a)})")
            .mkString("named_struct(", ", ", ")")
          val seqStep = if (step == 1L) "" else s", ${step}L"
          val fold = s"IF($upper < $lower, $initStruct, " +
            s"aggregate(sequence($lower, $upper$seqStep), $initStruct, " +
            s"($lamAcc, $lv) -> $stepStruct))"
          accs.foldLeft(saved._1) { (ls, a) =>
            ls.updated(a, (s"($fold).$a", saved._1(a)._2))
          }
      }
      declDepth = saved._2; declSqlType = saved._3; sbLocals = saved._4
      activeFoldVars -= lamAcc
      accs
    }

    /** `while (i < bound) { <accumulation...>; i++; }` — the counted
      * loop written as a while (UDF authors write both): the variable is
      * an int/long local declared BEFORE the loop, the bound is
      * ascending, and the body's LAST top-level statement steps the
      * variable by exactly one. Lowered by token-level desugaring to the
      * counted `for` (fresh loop variable seeded with the local's
      * current value, body references renamed — all of [[parseFor]]'s
      * validation and fold machinery applies verbatim), after which the
      * local REBINDS to its Java post-loop value GREATEST(start,
      * bound[+1]) so later statements that read it see what javac's
      * execution would leave. Anything else — a missing or mid-body
      * increment, a bound reading the variable itself or an accumulator
      * (data-dependent), an unbraced body — rejects with the shim's
      * compile-error text.
      */
    private def parseWhile(): Unit = {
      eat("(")
      val lv = next() match {
        case Ident(n) => n
        case other => fail("while-loop condition must test an int/long " +
          s"local, found $other")
      }
      val (loSql, lvT) = locals.getOrElse(lv, fail(s"while-loop variable " +
        s"'$lv' must be a local declared before the loop"))
      lvT match {
        case TNum(true) =>
        case _ => fail(s"while-loop variable '$lv' must be an int or long local")
      }
      // same-block rule as the for-loop's accumulators: a while inside a
      // branch whose variable lives OUTSIDE the branch would have its
      // post-loop rebind silently discarded by the branch-exit locals
      // restore — reject rather than return the pre-loop value
      if (!declDepth.get(lv).contains(scopeDepth))
        fail(s"while-loop variable '$lv' must be declared in the same " +
          "block as the loop itself (a branch-exit restore would discard " +
          "its post-loop value)")
      val lvJavaT = declSqlType.get(lv) match {
        case Some("INT") => "int"
        case Some("BIGINT") => "long"
        case other => fail(s"while-loop variable '$lv' must be declared " +
          s"int or long, not ${other.getOrElse("an argument")}")
      }
      val cmp = next() match {
        case Op("<") => "<"
        case Op("<=") => "<="
        case other => fail("while-loop condition must be an ascending " +
          s"'<' or '<=' bound, found $other")
      }
      // capture the bound's tokens up to the matching ')'
      val boundToks = scala.collection.mutable.ListBuffer.empty[Tok]
      var depth = 0
      var scanning = true
      while (scanning) toks match {
        case Op("(") :: rest => depth += 1; boundToks += Op("("); toks = rest
        case Op(")") :: rest if depth == 0 => toks = rest; scanning = false
        case Op(")") :: rest => depth -= 1; boundToks += Op(")"); toks = rest
        case t :: rest => boundToks += t; toks = rest
        case Nil => fail("unexpected end of while condition")
      }
      // a bound reading the variable re-evaluates against the moving value
      // in Java; the fold snapshots it once — reject, like the
      // accumulator-reading bound in parseFor
      if (boundToks.exists { case Ident(`lv`) => true; case _ => false })
        fail(s"the while bound reads '$lv' itself — data-dependent loops " +
          "are not supported by this engine's translation shim")
      // bound SQL for the post-loop rebind (same expression grammar)
      val savedToks = toks
      toks = boundToks.toList :+ Op(";")
      val (boundSql, _) = expression()
      toks = savedToks
      if (!peek.contains(Op("{")))
        fail("while-loop bodies must be braced, with the variable's " +
          "increment as the last statement")
      next()
      // capture the body to the matching '}' and strip the trailing
      // unit increment
      val body = scala.collection.mutable.ListBuffer.empty[Tok]
      depth = 0
      scanning = true
      while (scanning) toks match {
        case Op("{") :: rest => depth += 1; body += Op("{"); toks = rest
        case Op("}") :: rest if depth == 0 => toks = rest; scanning = false
        case Op("}") :: rest => depth -= 1; body += Op("}"); toks = rest
        case t :: rest => body += t; toks = rest
        case Nil => fail("unexpected end of while body")
      }
      val b = body.toList
      def strip(suffix: List[Tok]): Option[List[Tok]] =
        if (b.endsWith(suffix)) Some(b.dropRight(suffix.length)) else None
      val bodyNoInc = strip(List(Ident(lv), Op("+"), Op("+"), Op(";")))
        .orElse(strip(List(Op("+"), Op("+"), Ident(lv), Op(";"))))
        .orElse(strip(List(Ident(lv), Op("+"), Op("="), NumLit("1", integral = true), Op(";"))))
        .orElse(strip(List(Ident(lv), Op("="), Ident(lv), Op("+"), NumLit("1", integral = true), Op(";"))))
        .getOrElse(fail("while loops must step their variable by exactly " +
          s"one ('$lv++', '++$lv', '$lv += 1' or '$lv = $lv + 1') as the " +
          "LAST body statement"))
      // fresh loop-variable name: collision-free against everything the
      // synthesized body could reference
      val taken = (locals.keySet ++ argTypes.keySet ++
        bodyNoInc.collect { case Ident(n) => n }).toSet
      val fresh = Iterator.from(0).map(i => s"__w$i").find(!taken(_)).get
      val renamed = bodyNoInc.map {
        case Ident(`lv`) => Ident(fresh)
        case t => t
      }
      // desugar: for (<type> fresh = <lv's current value>; fresh cmp
      // <bound>; fresh++) { renamed-body } <rest> — expression() resolves
      // the init Ident(lv) to the local's pre-loop SQL, and everything
      // after the while survives untouched at the tail
      val rest = toks
      toks = List(Op("("), Ident(lvJavaT), Ident(fresh), Op("="), Ident(lv),
          Op(";"), Ident(fresh), Op(cmp)) ++ boundToks.toList ++
        List(Op(";"), Ident(fresh), Op("+"), Op("+"), Op(")"), Op("{")) ++
        renamed ++ List(Op("}")) ++ rest
      parseFor()
      // Java leaves the variable at the first bound-failing value: the
      // start if the loop never ran, else the bound (exclusive) or
      // bound+1 (inclusive) — the ascending unit step lands there
      // exactly. NULL-strict: Spark's GREATEST skips nulls, but a null
      // start/bound must poison the variable like it poisons the fold's
      // accumulators (Java would NPE on the unbox), not fall back to the
      // non-null operand.
      val lvSqlT = declSqlType.getOrElse(lv, "BIGINT")
      val loB = s"CAST(($loSql) AS BIGINT)"
      val hiB = s"CAST(($boundSql) AS BIGINT)"
      val top = if (cmp == "<") hiB else s"($hiB + 1L)"
      val post = s"CAST(IF($loB IS NULL OR $hiB IS NULL, NULL, " +
        s"GREATEST($loB, $top)) AS $lvSqlT)"
      locals = locals.updated(lv, (post, TNum(integral = true)))
    }

    /** One loop-body accumulation statement over accumulator `acc` (bound
      * in [[locals]] to its in-fold value): `acc = expr;`, `acc <op>= expr;`
      * or `acc.append(e1).append(e2)...;` on a StringBuilder. Rebinds
      * [[locals]] so sequential statements thread acc' = f2(f1(acc)).
      */
    private def parseAccumStmt(acc: String): Unit = {
      val cur = locals(acc)
      // Java applies the declared-type conversion at EVERY statement
      // (compound assignment narrows per step: `int s; s += 0.7; s += 0.7;`
      // is 0, not (int)1.4), and later statements read the CONVERTED
      // value — so the cast lands here, per statement, not only at the
      // fold's end. cur._2 stays the declared shim type by this invariant.
      val sqlT = declSqlType.getOrElse(acc, "STRING")
      def rebind(e: (String, T)): Unit =
        locals = locals.updated(acc, (s"CAST((${e._1}) AS $sqlT)", cur._2))
      toks match {
        case Ident(_) :: Op("=") :: rest =>
          toks = rest
          val e = expression()
          eat(";")
          // javac rejects e.g. `int s; s = "a" + s;` — without this guard
          // the per-statement CAST would lower it to CAST(<string> AS
          // INT) and produce null/garbage per step instead of an error
          (cur._2, e._2) match {
            case (_, TNull) => // null assigns to any reference type in Java
            case (TNum(_), TNum(_)) | (TStr, TStr) | (TBool, TBool) =>
            case (at, et) => fail(s"incompatible types in loop body: cannot " +
              s"assign ${tName(et)} value to '$acc' (declared ${tName(at)})")
          }
          rebind(e)
        case Ident(_) :: Op(op @ ("+" | "-" | "*" | "/")) :: Op("=") :: rest =>
          toks = rest
          val e = expression()
          eat(";")
          rebind(compoundCombine(op, cur, e))
        case Ident(_) :: Op(".") :: Ident("append") :: _ if sbLocals.contains(acc) =>
          toks = toks.drop(3)
          var v = cur
          var more = true
          while (more) {
            callArgs() match {
              case List(a) => v = (s"concat(${v._1}, ${javaStr(a)})", TStr)
              case _ => fail("StringBuilder.append takes exactly one argument")
            }
            toks match {
              case Op(".") :: Ident("append") :: rest => toks = rest
              case _ => more = false
            }
          }
          eat(";")
          rebind(v)
        case _ => fail("a counted-loop body may only contain accumulation " +
          s"statements over '$acc' ('$acc = ...', '$acc += ...' or " +
          s"'$acc.append(...)')")
      }
    }

    /** Human-readable shim-type name for error text. */
    private def tName(t: T): String = t match {
      case TStr => "a String"
      case TChar => "a char"
      case TNum(true) => "an integral"
      case TNum(false) => "a floating-point"
      case TBool => "a boolean"
      case TNull => "a null"
      case _ => "an unsupported-type"
    }

    /** Java compound-assignment combine — same semantics as the binary
      * operator table: String `+=` stringifies like `String +`, integral
      * `/` truncates.
      */
    private def compoundCombine(op: String, l0: (String, T), r0: (String, T)): (String, T) =
      if (op == "+" && (l0._2 == TStr || r0._2 == TStr))
        (s"concat(${javaStr(l0)}, ${javaStr(r0)})", TStr)
      else {
        // a char-typed ACCUMULATOR narrows back to char after each
        // compound step in Java (implicit cast) — the shim carries chars
        // as strings and cannot model the wrap-around, so reject rather
        // than silently promote to int
        if (l0._2 == TChar)
          fail(s"compound assignment on a char accumulator is not " +
            "supported by this engine's translation shim (Java narrows " +
            "the result back to char, which the translation cannot model)")
        // a char OPERAND widens to its code point like any numeric context
        val (l, r) = (widenChar(l0), widenChar(r0))
        // javac rejects e.g. String *= int; don't emit nonsense SQL for it
        (l._2, r._2) match {
          case (TNum(_), TNum(_)) =>
          case _ => fail(s"operator '$op=' requires numeric operands")
        }
        val t = numT(l, r)
        if (op == "/" && t == TNum(integral = true))
          (s"(${l._1} div ${r._1})", t)
        else (s"(${l._1} $op ${r._1})", t)
      }

    /** Java `String.valueOf` of an expression: non-strings stringify, null
      * prints "null".
      */
    private def javaStr(e: (String, T)): String = e._2 match {
      // a char is already its 1-char string; Java appends it verbatim
      case TStr | TChar => s"COALESCE(${e._1}, 'null')"
      case _ => s"COALESCE(CAST(${e._1} AS STRING), 'null')"
    }

    /** Lower a statement sequence to the expression it returns. `cont` is
      * the already-lowered continuation that runs if the sequence falls
      * through; None = falling through reaches the end of the function
      * (javac's missing-return error). Join points duplicate the
      * continuation into both branches — expressions are pure and codegen
      * eliminates the common subexpressions.
      */
    def lower(stmts: List[Stmt], cont: Option[(String, T)]): Option[(String, T)] =
      stmts match {
        case Nil => cont
        case SRet(e) :: Nil => Some(e)
        case SRet(_) :: _ => fail("unreachable code after return")
        case SIf(c, thn, els) :: rest =>
          val thnSolo = lower(thn, None)
          val elsSolo = lower(els, None)
          if (thnSolo.isDefined && elsSolo.isDefined && rest.nonEmpty)
            fail("unreachable code after an if/else where both branches return")
          val k = if (thnSolo.isDefined && elsSolo.isDefined) None
                  else lower(rest, cont)
          val tv = thnSolo.orElse(lower(thn, k))
          val ev = elsSolo.orElse(lower(els, k))
          (tv, ev) match {
            case (Some(a), Some(b)) =>
              val t = if (a._2 == TNull) b._2 else a._2
              Some((s"IF($c, ${a._1}, ${b._1})", t))
            // any None here means some path falls through with no
            // continuation (cont was None — with a continuation, lowering
            // is total by induction): propagate "does not return on every
            // path" and let the top level report javac's missing-return
            case _ => None
          }
      }

    def expression(): (String, T) = ternary()

    private def ternary(): (String, T) = {
      val c = or()
      peek match {
        case Some(Op("?")) =>
          eat("?")
          val (a, ta) = ternary()
          eat(":")
          val (b, tb) = ternary()
          val t = if (ta == TNull) tb else ta
          (s"IF(${c._1}, $a, $b)", t)
        case _ => c
      }
    }

    private def binaryChain(sub: () => (String, T), ops: Set[String])
                           (combine: (String, (String, T), (String, T)) => (String, T)): (String, T) = {
      var left = sub()
      var continue = true
      while (continue) peek match {
        case Some(Op(o)) if ops.contains(o) =>
          next()
          left = combine(o, left, sub())
        case _ => continue = false
      }
      left
    }

    private def or(): (String, T) =
      binaryChain(() => and(), Set("||")) { (_, l, r) => (s"(${l._1} OR ${r._1})", TBool) }

    private def and(): (String, T) =
      binaryChain(() => equality(), Set("&&")) { (_, l, r) => (s"(${l._1} AND ${r._1})", TBool) }

    private def equality(): (String, T) =
      binaryChain(() => relational(), Set("==", "!=")) { (o, l0, r0) =>
        // char == char compares as 1-char strings (code-point order);
        // char == int is Java numeric promotion → ascii the char side
        val (l, r) = charVsNum(l0, r0)
        val sql = (o, l._2, r._2) match {
          case ("==", _, TNull) => s"(${l._1} IS NULL)"
          case ("!=", _, TNull) => s"(${l._1} IS NOT NULL)"
          case ("==", TNull, _) => s"(${r._1} IS NULL)"
          case ("!=", TNull, _) => s"(${r._1} IS NOT NULL)"
          case ("==", _, _) => s"(${l._1} = ${r._1})"
          case _ => s"(${l._1} != ${r._1})"
        }
        (sql, TBool)
      }

    private def relational(): (String, T) =
      binaryChain(() => additive(), Set("<", "<=", ">", ">=")) { (o, l0, r0) =>
        val (l, r) = charVsNum(l0, r0)
        (s"(${l._1} $o ${r._1})", TBool)
      }

    /** Comparison-operand pairing for char: char-vs-numeric widens the
      * char side to its code point (Java numeric promotion); char-vs-char
      * stays a string comparison (lexicographic = code-point order for
      * single chars). Everything else passes through untouched.
      */
    private def charVsNum(l: (String, T), r: (String, T)): ((String, T), (String, T)) =
      (l._2, r._2) match {
        case (TChar, TNum(_)) => (widenChar(l), r)
        case (TNum(_), TChar) => (l, widenChar(r))
        case _ => (l, r)
      }

    private def additive(): (String, T) =
      binaryChain(() => multiplicative(), Set("+", "-")) { (o, l0, r0) =>
        if (o == "+" && (l0._2 == TStr || r0._2 == TStr))
          // Java String + : String.valueOf both sides; null prints "null"
          // (a char appends as itself — no widening in string context)
          (s"concat(${javaStr(l0)}, ${javaStr(r0)})", TStr)
        else {
          // char + char / char + int are INT arithmetic in Java
          val (l, r) = (widenChar(l0), widenChar(r0))
          (s"(${l._1} $o ${r._1})", numT(l, r))
        }
      }

    private def multiplicative(): (String, T) =
      binaryChain(() => unary(), Set("*", "/", "%")) { (o, l0, r0) =>
        val (l, r) = (widenChar(l0), widenChar(r0))
        // Java / on two integral operands TRUNCATES; Spark's fractional /
        // would promote — emit integer division to keep e.g. the avg-style
        // 'sum / count * n' SFUNC shapes exact
        val t = numT(l, r)
        if (o == "/" && t == TNum(integral = true))
          (s"(${l._1} div ${r._1})", t)
        else (s"(${l._1} $o ${r._1})", t)
      }

    private def numT(l: (String, T), r: (String, T)): T = (l._2, r._2) match {
      case (TNum(a), TNum(b)) => TNum(a && b)
      case (TNum(_), _) | (_, TNum(_)) => TNum(integral = false)
      case _ => TOther
    }

    /** Java's char→int widening for numeric contexts: a char operand
      * becomes its code point (`ascii`), everything else passes through.
      */
    private def widenChar(e: (String, T)): (String, T) =
      if (e._2 == TChar) (s"ascii(${e._1})", TNum(integral = true)) else e

    private def unary(): (String, T) = peek match {
      case Some(Op("!")) => next(); val (e, _) = unary(); (s"(NOT $e)", TBool)
      case Some(Op("-")) =>
        next(); val (e, t) = widenChar(unary()); (s"(- $e)", t)
      case Some(Op("+")) => next(); widenChar(unary())
      case _ => postfix()
    }

    private def postfix(): (String, T) = {
      var cur = primary()
      var continue = true
      while (continue) peek match {
        case Some(Op(".")) =>
          // array `.length` is a FIELD in Java, not a method call — and
          // the length of a literal array is a parse-time constant
          toks match {
            case Op(".") :: Ident("length") :: rest
                if cur._2.isInstanceOf[TArr] &&
                  !rest.headOption.contains(Op("(")) =>
              next(); next()
              cur = (cur._2.asInstanceOf[TArr].n.toString, TNum(integral = true))
            case _ =>
              next()
              cur = methodCall(cur)
          }
        case Some(Op("[")) if cur._2.isInstanceOf[TArr] =>
          // Java indexing: 0-based; out of bounds THROWS (the reference
          // UDF would raise AIOOBE) — modeled with raise_error so a bad
          // index cannot silently read as NULL. A null index keeps the
          // shim's null-poisoning convention.
          next()
          val (i, it) = expression()
          eat("]")
          val arr = cur._2.asInstanceOf[TArr]
          val idx = it match {
            case TNum(true) => i
            case TChar => s"ascii($i)"
            case other => fail(s"array index of ${tName(other)} type " +
              "(Java requires int)")
          }
          // element_at requires an INT position (a long-typed local would
          // not implicitly narrow); literal arrays are tiny, so the cast
          // is always in range once the bounds check passed
          cur = (s"IF(($idx) IS NULL, NULL, IF(($idx) >= 0 AND ($idx) < ${arr.n}, " +
            s"element_at(${cur._1}, CAST(($idx) + 1 AS INT)), " +
            s"raise_error('Array index out of bounds')))", arr.elem)
        case _ => continue = false
      }
      cur
    }

    private def callArgs(): List[(String, T)] = {
      eat("(")
      if (peek.contains(Op(")"))) { next(); Nil }
      else {
        val args = scala.collection.mutable.ListBuffer(expression())
        while (peek.contains(Op(","))) { next(); args += expression() }
        eat(")")
        args.toList
      }
    }

    /** `.name(args)` on `recv` — the typed-receiver method table. */
    private def methodCall(recv: (String, T)): (String, T) = {
      val name = next() match {
        case Ident(n) => n
        case other => fail(s"expected method name after '.', found $other")
      }
      val args = callArgs()
      val (r, rt) = recv
      (name, args) match {
        case ("toString", Nil) => (s"CAST($r AS STRING)", TStr)
        // java.lang.String methods on string-typed receivers
        case ("length", Nil) if rt == TStr => (s"length($r)", TNum(integral = true))
        case ("toLowerCase", Nil) if rt == TStr => (s"lower($r)", TStr)
        case ("toUpperCase", Nil) if rt == TStr => (s"upper($r)", TStr)
        case ("trim", Nil) if rt == TStr => (s"trim($r)", TStr)
        case ("concat", List(a)) if rt == TStr =>
          // Java String.concat does NOT stringify null (it NPEs) — but it
          // only accepts a String argument, so plain concat() matches
          (s"concat($r, ${a._1})", TStr)
        case ("isEmpty", Nil) if rt == TStr => (s"(length($r) = 0)", TBool)
        case ("contains", List(a)) if rt == TStr =>
          (s"contains($r, ${a._1})", TBool)
        case ("startsWith", List(a)) if rt == TStr =>
          (s"startswith($r, ${a._1})", TBool)
        case ("endsWith", List(a)) if rt == TStr =>
          (s"endswith($r, ${a._1})", TBool)
        case ("indexOf", List(a)) if rt == TStr =>
          // Java is 0-based with -1 on miss; SQL instr is 1-based with 0.
          // A char argument searches for its 1-char string — same result.
          (s"(instr($r, ${a._1}) - 1)", TNum(integral = true))
        case ("indexOf", List(a, from)) if rt == TStr =>
          // Java indexOf(str, from): a negative from behaves as 0 — clamp
          // the 1-based locate position to 1 or the miss case would
          // surface as locate's pos<1 zero result (= a spurious -1 hit at
          // "not found" even when the needle exists)
          (s"(locate(${a._1}, $r, greatest((${from._1}) + 1, 1)) - 1)",
            TNum(integral = true))
        case ("lastIndexOf", List(a)) if rt == TStr =>
          // Java lastIndexOf: 0-based index of the LAST occurrence, -1 on
          // miss. locate over the reversed pair measures the distance
          // from the end: last = length(r) − pos_rev − length(needle) + 1.
          // The empty needle lands on length(r) exactly like Java
          // (locate('', x) is 1).
          val rev = s"locate(reverse(${a._1}), reverse($r))"
          (s"(CASE WHEN $rev = 0 THEN -1 " +
            s"ELSE length($r) - $rev - length(${a._1}) + 1 END)",
            TNum(integral = true))
        case ("charAt", List(i)) if rt == TStr =>
          // Java charAt THROWS on out-of-bounds; an unguarded substr would
          // return '' and flow on silently — raise like Java does
          (s"(CASE WHEN (${i._1}) < 0 OR (${i._1}) >= length($r) " +
            s"THEN raise_error(concat('String index out of range: ', " +
            s"CAST(${i._1} AS STRING))) " +
            s"ELSE substr($r, (${i._1}) + 1, 1) END)", TChar)
        case ("replace", List(a, b)) if rt == TStr =>
          (s"replace($r, ${a._1}, ${b._1})", TStr)
        // index args parenthesize defensively: composed offsets must not
        // reassociate with the +1/length arithmetic added here
        case ("substring", List(a)) if rt == TStr =>
          // Java substring(begin) is 0-based to end; substr is 1-based
          (s"substr($r, (${a._1}) + 1)", TStr)
        case ("substring", List(a, b)) if rt == TStr =>
          // Java substring(begin, end): length = end - begin
          (s"substr($r, (${a._1}) + 1, (${b._1}) - (${a._1}))", TStr)
        case ("equals", List(a)) if rt == TStr =>
          (s"($r = ${a._1})", TBool)
        case ("equalsIgnoreCase", List(a)) if rt == TStr =>
          (s"(lower($r) = lower(${a._1}))", TBool)
        case ("intValue", Nil) => (s"CAST($r AS INT)", TNum(integral = true))
        case ("longValue", Nil) => (s"CAST($r AS BIGINT)", TNum(integral = true))
        case ("doubleValue", Nil) => (s"CAST($r AS DOUBLE)", TNum(integral = false))
        case ("floatValue", Nil) => (s"CAST($r AS FLOAT)", TNum(integral = false))
        case ("shortValue", Nil) => (s"CAST($r AS SMALLINT)", TNum(integral = true))
        case ("byteValue", Nil) => (s"CAST($r AS TINYINT)", TNum(integral = true))
        case ("booleanValue", Nil) => (s"CAST($r AS BOOLEAN)", TBool)
        case ("get", List(k)) => rt match {
          // Java Map.get: absent key → null (Spark [] does the same with
          // ANSI off); Java List.get is 0-based like Spark's [] on arrays
          case TMap(v) => (s"$r[${k._1}]", ofCql(v))
          case TList(e) => (s"$r[${k._1}]", ofCql(e))
          case _ => fail(s"get() on a non-collection receiver '$r'")
        }
        case (g, List((f, _))) if g.startsWith("get") && rt.isInstanceOf[TUdtT] =>
          val fieldName = f.stripPrefix("'").stripSuffix("'")
          val udt = rt.asInstanceOf[TUdtT].udt
          val ft = udt.fields.collectFirst { case (n, t) if n == fieldName => t }
            .getOrElse(fail(s"UDT ${udt.typeName} has no field '$fieldName'"))
          val cast = g match {
            case "getString" => "STRING"
            case "getInt" => "INT"
            case "getLong" => "BIGINT"
            case "getDouble" => "DOUBLE"
            case "getFloat" => "FLOAT"
            case "getBoolean" => "BOOLEAN"
            case other => fail(s"unsupported UDT accessor '$other'")
          }
          (s"CAST($r.`$fieldName` AS $cast)", ofCql(ft))
        case (m, _) => fail(s"unsupported method call '.$m' on '$r'")
      }
    }

    /** The box classes' string-parse statics (Java's tolerant-input
      * entry points — and the only exception source the try/catch rung
      * admits, because their SQL form is NULL exactly when Java throws).
      */
    private val parseStatics: Map[String, String] = Map(
      "Integer" -> "parseInt", "Long" -> "parseLong",
      "Double" -> "parseDouble", "Float" -> "parseFloat",
      "Short" -> "parseShort", "Byte" -> "parseByte",
      "Boolean" -> "parseBoolean")

    private val boxClasses: Map[String, (String, T)] = Map(
      "Integer" -> ("INT", TNum(integral = true)), "Long" -> ("BIGINT", TNum(integral = true)),
      "Double" -> ("DOUBLE", TNum(integral = false)), "Float" -> ("FLOAT", TNum(integral = false)),
      "Short" -> ("SMALLINT", TNum(integral = true)), "Byte" -> ("TINYINT", TNum(integral = true)),
      "Boolean" -> ("BOOLEAN", TBool), "String" -> ("STRING", TStr))

    private val mathFns: Map[String, String] = Map(
      "sin" -> "sin", "cos" -> "cos", "tan" -> "tan", "asin" -> "asin",
      "acos" -> "acos", "atan" -> "atan", "sqrt" -> "sqrt", "cbrt" -> "cbrt",
      "exp" -> "exp", "log" -> "ln", "log10" -> "log10", "pow" -> "power",
      "abs" -> "abs", "floor" -> "floor", "ceil" -> "ceil",
      "signum" -> "sign")

    private def primary(): (String, T) = next() match {
      case NumLit(sql, integral) => (sql, TNum(integral))
      case StrLit(sql) => (sql, TStr)
      case CharLit(sql) => (sql, TChar)
      case Op("(") =>
        val e = expression()
        eat(")")
        (s"(${e._1})", e._2)
      case Ident("null") => ("NULL", TNull)
      case Ident("true") => ("true", TBool)
      case Ident("false") => ("false", TBool)
      // an argument or local named like a class ("Math") must resolve as
      // the variable — declared names shadow the static tables
      case Ident(name) if locals.contains(name) => locals(name)
      case Ident(name) if argTypes.contains(name) => (name, ofCql(argTypes(name)))
      case Ident("new") => next() match {
        case Ident("String") =>
          callArgs() match {
            case List((a, _)) => (s"CAST($a AS STRING)", TStr)
            case _ => fail("new String(..) supports exactly one argument")
          }
        case Ident("StringBuilder") =>
          callArgs() match {
            case Nil => ("''", TStr)
            // StringBuilder(int) is a capacity hint — still empty
            case List((_, TNum(_))) => ("''", TStr)
            case List((a, _)) => (s"CAST($a AS STRING)", TStr)
            case _ => fail("new StringBuilder(..) supports at most one argument")
          }
        case other => fail(s"unsupported constructor 'new $other'")
      }
      case Ident("Math") =>
        eat(".")
        val fn = next() match {
          case Ident(n) => n
          case other => fail(s"expected Math method, found $other")
        }
        val args = callArgs()
        fn match {
          case "copySign" => args match {
            case List((m, _), (s, _)) =>
              (s"(abs(CAST($m AS DOUBLE)) * IF(sign(CAST($s AS DOUBLE)) < 0, -1.0D, 1.0D))",
                TNum(integral = false))
            case _ => fail("Math.copySign takes (magnitude, sign)")
          }
          case "min" | "max" => args match {
            // NOT least/greatest: those skip NULLs (returning the other
            // operand where Java NPEs at unboxing — modeled as NULL, like
            // every other null-poisoned expression here) and order NaN as
            // the largest value, where Java's Math.min/max PROPAGATE NaN.
            // Signed-zero ordering (min(+0.0,-0.0) = -0.0 in Java) is the
            // one remaining divergence, like the copySign/round notes.
            case List((a, ta), (b, tb)) =>
              val integral = (ta, tb) match {
                case (TNum(true), TNum(true)) => true
                case _ => false
              }
              val cmp = if (fn == "min") "<=" else ">="
              if (integral)
                (s"IF(($a) IS NULL OR ($b) IS NULL, NULL, IF(($a) $cmp ($b), $a, $b))",
                  TNum(integral = true))
              else
                (s"IF(($a) IS NULL OR ($b) IS NULL, NULL, " +
                  s"IF(isnan(CAST($a AS DOUBLE)) OR isnan(CAST($b AS DOUBLE)), " +
                  s"CAST('NaN' AS DOUBLE), IF(($a) $cmp ($b), $a, $b)))",
                  TNum(integral = false))
            case _ => fail(s"Math.$fn takes two arguments")
          }
          case "floorDiv" | "floorMod" => args match {
            // Java floor division/modulus over integrals: derive from the
            // truncating `div` with an exact sign correction — pmod would
            // only match floorMod for a positive divisor. Division by
            // zero nulls (the house model of a Java throw); char operands
            // widen to code points like every numeric context.
            case List(a0, b0) =>
              val (a1, b1) = (widenChar(a0), widenChar(b0))
              (a1._2, b1._2) match {
                case (TNum(true), TNum(true)) =>
                case _ => fail(s"Math.$fn requires integral operands")
              }
              val (a, b) = (a1._1, b1._1)
              val fd = s"(($a div $b) - IF((($a % $b) != 0) AND " +
                s"((($a) < 0) != (($b) < 0)), 1, 0))"
              if (fn == "floorDiv") (fd, TNum(integral = true))
              else (s"(($a) - $fd * ($b))", TNum(integral = true))
            case _ => fail(s"Math.$fn takes two arguments")
          }
          case "round" => args match {
            // Java Math.round is floor(x + 0.5) returning long — NOT the
            // HALF_UP (away-from-zero) rounding of SQL round(): they differ
            // on negative exact halves (Java round(-2.5) = -2)
            case List((x, _)) =>
              (s"CAST(FLOOR(CAST($x AS DOUBLE) + 0.5D) AS BIGINT)", TNum(integral = true))
            case _ => fail("Math.round takes one argument")
          }
          case f => mathFns.get(f) match {
            case Some(sqlFn) => (s"$sqlFn(${args.map(_._1).mkString(", ")})",
              TNum(integral = false))
            case None => fail(s"unsupported Math method '$f'")
          }
        }
      case Ident(cls) if boxClasses.contains(cls) && peek.contains(Op(".")) =>
        eat(".")
        next() match {
          case Ident("valueOf") =>
            callArgs() match {
              case List((a, _)) =>
                val (sqlT, t) = boxClasses(cls)
                (s"CAST($a AS $sqlT)", t)
              case _ => fail(s"$cls.valueOf takes one argument")
            }
          case Ident(pm) if parseStatics.get(cls).contains(pm) =>
            callArgs() match {
              case List((a, at)) if at == TStr || at == TNull =>
                val (sqlT, t) = boxClasses(cls)
                if (cls == "Boolean")
                  // parseBoolean never throws: null input is simply not
                  // "true" — Java returns false, so pin false, not NULL
                  (s"COALESCE((lower($a) = 'true'), false)", TBool)
                else if (cls == "Double" || cls == "Float")
                  // Java parseDouble/parseFloat trim whitespace and accept
                  // Infinity/NaN — CAST's string grammar matches (the 'd'/
                  // 'f'-suffix and hex-float forms are the one divergence:
                  // Java parses them, CAST nulls → catch)
                  (s"CAST($a AS $sqlT)", t)
                else
                  // Java parseInt/parseLong/...: optional sign + digits
                  // ONLY — CAST alone also accepts whitespace and decimal
                  // points, so guard with the exact grammar; overflow
                  // nulls via CAST where Java throws. NULL exactly when
                  // Java throws — the property parseTryCatch relies on.
                  // \z, not $: java.util.regex '$' matches BEFORE a trailing
                  // line terminator, so "12\n" would pass the guard while
                  // Java's parseInt throws. (\\z below is the SQL-literal
                  // escape — spark.sql unescapes it to \z.)
                  (s"IF($a RLIKE '^[+-]?[0-9]+\\\\z', CAST($a AS $sqlT), NULL)", t)
              case List(_) => fail(s"$cls.$pm takes a String argument")
              case _ => fail(s"$cls.$pm takes one argument")
            }
          case Ident("MAX_VALUE") | Ident("MIN_VALUE") =>
            fail(s"unsupported constant on $cls")
          case other => fail(s"unsupported static call '$cls.$other'")
        }
      case Ident(name) =>
        locals.get(name).orElse(argTypes.get(name).map(t => (name, ofCql(t)))) match {
          case Some(v) => v
          case None => fail(s"unknown identifier '$name' (in scope: " +
            s"${(argTypes.keys ++ locals.keys).toSeq.sorted.mkString(", ")})")
        }
      case other => fail(s"unexpected token $other")
    }
  }
}
