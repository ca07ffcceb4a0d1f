package graft

import graft.cql.Ast._
import graft.cql.JavaUdfShim
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property harness for the LANGUAGE java translation shim: random Java
  * integer-expression trees (literals, args, + - * / %, null-guard
  * ternaries, boxing round-trips) are rendered to Java source, translated,
  * and the resulting Spark SQL is evaluated by the live session against an
  * in-test JAVA-SEMANTICS interpreter of the same tree (int truncating
  * division, null propagation). Any divergence is a translator bug by
  * construction.
  */
class JavaUdfShimPropertySpec extends SparkSpec {

  // Expression ADT mirrored by both the Java renderer and the evaluator.
  private sealed trait E
  private case class Lit(v: Int) extends E
  private case class Arg(n: String) extends E
  private case class LRef(n: String) extends E          // declared local
  private case class GArg(n: String) extends E          // null-guarded arg (total)
  private case class Bin(op: String, l: E, r: E) extends E
  private case class NullGuard(a: String, then_ : E, els: E) extends E
  private case class Boxed(e: E) extends E

  private val argNames = Seq("a", "b", "c")

  private def genExpr(depth: Int): Gen[E] =
    if (depth <= 0) Gen.oneOf(
      Gen.chooseNum(-20, 20).map(Lit.apply),
      Gen.oneOf(argNames).map(Arg.apply))
    else Gen.frequency(
      2 -> Gen.chooseNum(-20, 20).map(Lit.apply),
      2 -> Gen.oneOf(argNames).map(Arg.apply),
      4 -> (for {
        op <- Gen.oneOf("+", "-", "*", "/", "%")
        l <- genExpr(depth - 1); r <- genExpr(depth - 1)
      } yield Bin(op, l, r)),
      1 -> (for {
        a <- Gen.oneOf(argNames)
        t <- genExpr(depth - 1); e <- genExpr(depth - 1)
      } yield NullGuard(a, t, e)),
      1 -> genExpr(depth - 1).map(Boxed.apply))

  private def render(e: E): String = e match {
    case Lit(v) if v < 0 => s"($v)"
    case Lit(v) => v.toString
    case Arg(n) => s"$n.intValue()"
    case LRef(n) => n
    case GArg(n) => s"($n != null ? $n.intValue() : 0)"
    case Bin(op, l, r) => s"(${render(l)} $op ${render(r)})"
    case NullGuard(a, t, e2) => s"($a != null ? ${render(t)} : ${render(e2)})"
    case Boxed(inner) => s"Integer.valueOf(${render(inner)})"
  }

  /** Java semantics: 32-bit wrapping arithmetic, truncating /, x%0 and x/0
    * poison the evaluation (modeled as None — SQL yields null with ANSI
    * off); a null arg unboxed via intValue() also poisons (Java would NPE,
    * SQL nulls — generator only dereferences guarded args to stay in the
    * common semantics).
    */
  private def eval(e: E, args: Map[String, Option[Int]],
                   env: Map[String, Option[Int]] = Map.empty): Option[Int] = e match {
    case Lit(v) => Some(v)
    case Arg(n) => args(n)
    case LRef(n) => env(n)
    case GArg(n) => Some(args(n).getOrElse(0))
    case Boxed(inner) => eval(inner, args, env)
    case NullGuard(a, t, e2) =>
      if (args(a).isDefined) eval(t, args, env) else eval(e2, args, env)
    case Bin(op, l, r) =>
      for {
        lv <- eval(l, args, env)
        rv <- eval(r, args, env)
        out <- op match {
          case "+" => Some(lv + rv)
          case "-" => Some(lv - rv)
          case "*" => Some(lv * rv)
          case "/" => if (rv == 0) None else Some(lv / rv)
          case "%" => if (rv == 0) None else Some(lv % rv)
        }
      } yield out
  }

  // ── statement-body grammar: decls + if/return chains ─────────────────

  /** `int d0 = e;… if (cond) {return v;}… return fin;` — conditions are
    * TOTAL (null-guarded args, no division) so Java and SQL agree on
    * branch selection; poison (/0, null) may appear only in returned
    * values, where both sides model it as None/NULL.
    */
  private case class Body(decls: List[(String, E)],
                          branches: List[(E, Int, E)], // (safeCond, threshold, value)
                          braces: Boolean, elseChain: Boolean, fin: E)

  private def genExprL(depth: Int, locals: Vector[String]): Gen[E] = {
    val leaves = Seq(
      Gen.chooseNum(-20, 20).map(Lit.apply): Gen[E],
      Gen.oneOf(argNames).map(Arg.apply): Gen[E]) ++
      (if (locals.nonEmpty) Seq(Gen.oneOf(locals).map(LRef.apply): Gen[E]) else Nil)
    if (depth <= 0) Gen.oneOf(leaves.head, leaves(1), leaves.drop(2): _*)
    else Gen.frequency(
      (2, leaves.head), (2, leaves(1)),
      (if (locals.nonEmpty) 2 else 0, leaves.lift(2).getOrElse(leaves.head)),
      (4, for {
        op <- Gen.oneOf("+", "-", "*", "/", "%")
        l <- genExprL(depth - 1, locals); r <- genExprL(depth - 1, locals)
      } yield Bin(op, l, r)),
      (1, for {
        a <- Gen.oneOf(argNames)
        t <- genExprL(depth - 1, locals); e <- genExprL(depth - 1, locals)
      } yield NullGuard(a, t, e)))
  }

  /** Total expressions for conditions: guarded args, no division. */
  private def genSafe(depth: Int): Gen[E] =
    if (depth <= 0) Gen.oneOf(
      Gen.chooseNum(-10, 10).map(Lit.apply),
      Gen.oneOf(argNames).map(GArg.apply))
    else Gen.frequency(
      2 -> Gen.chooseNum(-10, 10).map(Lit.apply),
      2 -> Gen.oneOf(argNames).map(GArg.apply),
      2 -> (for {
        op <- Gen.oneOf("+", "-", "*")
        l <- genSafe(depth - 1); r <- genSafe(depth - 1)
      } yield Bin(op, l, r)))

  private def genBody: Gen[Body] = for {
    nDecls <- Gen.choose(0, 2)
    declExprs <- Gen.listOfN(nDecls, Gen.const(())).flatMap { _ =>
      (0 until nDecls).foldLeft(Gen.const(List.empty[(String, E)])) { (acc, i) =>
        acc.flatMap { ds =>
          genExprL(2, ds.map(_._1).toVector).map(e => ds :+ (s"d$i", e))
        }
      }
    }
    locals = declExprs.map(_._1).toVector
    nBr <- Gen.choose(1, 3)
    branches <- Gen.listOfN(nBr, for {
      c <- genSafe(1); t <- Gen.chooseNum(-10, 10); v <- genExprL(2, locals)
    } yield (c, t, v))
    braces <- Gen.oneOf(true, false)
    elseChain <- Gen.oneOf(true, false)
    fin <- genExprL(2, locals)
  } yield Body(declExprs, branches, braces, elseChain, fin)

  private def renderBody(b: Body): String = {
    val decls = b.decls.map { case (n, e) => s"int $n = ${render(e)};" }
    val rets = b.branches.map { case (c, t, v) =>
      val r = s"return ${render(v)};"
      val body = if (b.braces) s"{ $r }" else r
      s"if ((${render(c)}) > ${if (t < 0) s"($t)" else t}) $body"
    }
    val chain =
      if (b.elseChain) rets.mkString(" else ") + s" else return ${render(b.fin)};"
      else rets.mkString(" ") + s" return ${render(b.fin)};"
    (decls :+ chain).mkString(" ")
  }

  private def evalBody(b: Body, args: Map[String, Option[Int]]): Option[Int] = {
    val env = b.decls.foldLeft(Map.empty[String, Option[Int]]) { case (env, (n, e)) =>
      env.updated(n, eval(e, args, env))
    }
    b.branches.collectFirst {
      case (c, t, v) if eval(c, args, env).exists(_ > t) => eval(v, args, env)
    }.getOrElse(eval(b.fin, args, env))
  }

  // ── return-arm switch grammar ────────────────────────────────────────

  /** `switch (<total sel>) { case l…: return v; … [default: return d;] }
    * [return fin;]` — the selector is TOTAL (guarded args, no division)
    * so Java and SQL agree on arm selection; poison may appear only in
    * the returned values, where both sides model it as None/NULL. Labels
    * are distinct across arms (Java rejects duplicates at compile time);
    * the trailing return exists exactly when there is no default (javac's
    * definite-return/unreachable rules both ways).
    */
  private case class SwitchCase(sel: E, arms: List[(List[Int], E)],
                                default: Option[E], fin: E)

  private def genSwitch: Gen[SwitchCase] = for {
    sel <- genSafe(2)
    nArms <- Gen.choose(1, 3)
    labelPool <- Gen.pick(6, (-15 to 15).toList)
    sizes <- Gen.listOfN(nArms, Gen.choose(1, 2))
    vals <- Gen.listOfN(nArms, genExpr(2))
    hasDef <- Gen.oneOf(true, false)
    defV <- genExpr(2)
    fin <- genExpr(2)
  } yield {
    var pool = labelPool.toList
    val arms = sizes.zip(vals).map { case (k, v) =>
      val ls = pool.take(k); pool = pool.drop(k); (ls, v)
    }
    SwitchCase(sel, arms, if (hasDef) Some(defV) else None, fin)
  }

  private def renderSwitch(b: SwitchCase): String = {
    val arms = b.arms.map { case (ls, v) =>
      ls.map(l => s"case $l:").mkString(" ") + s" return ${render(v)};"
    }.mkString(" ")
    val d = b.default.map(v => s" default: return ${render(v)};").getOrElse("")
    val tail = if (b.default.isDefined) "" else s" return ${render(b.fin)};"
    s"switch (${render(b.sel)}) { $arms$d }$tail"
  }

  private def evalSwitch(b: SwitchCase, args: Map[String, Option[Int]]): Option[Int] = {
    val v = eval(b.sel, args).get // total by construction
    b.arms.collectFirst { case (ls, e) if ls.contains(v) => eval(e, args) }
      .orElse(b.default.map(e => eval(e, args)))
      .getOrElse(eval(b.fin, args))
  }

  test("random return-arm switches translate with Java arm-selection " +
    "semantics (shared labels, default present/absent, poison values)") {
    import org.apache.spark.sql.functions.expr
    import spark.implicits._
    val cqlArgs = argNames.map(_ -> (CqlInt: CqlType))
    val argSets: Seq[Map[String, Option[Int]]] = Seq(
      Map("a" -> Some(7), "b" -> Some(-3), "c" -> Some(2)),
      Map("a" -> None, "b" -> Some(5), "c" -> Some(11)),
      Map("a" -> Some(0), "b" -> None, "c" -> Some(-8)),
      Map("a" -> Some(-15), "b" -> Some(15), "c" -> None))
    val base = argSets.map(m =>
      (m("a").map(Int.box).orNull, m("b").map(Int.box).orNull, m("c").map(Int.box).orNull))
      .toDF("a", "b", "c")
    val cases = (0 until 90).flatMap { i =>
      genSwitch(Gen.Parameters.default.withSize(1 + i % 8), Seed(0x57117CL + i))
    }
    cases.zipWithIndex.grouped(30).foreach { group =>
      val cols = group.map { case (b, i) =>
        val sql = JavaUdfShim.translate(renderSwitch(b), cqlArgs)
        expr(sql).cast("int").as(s"e$i")
      }
      val got = base.select(cols: _*).collect()
      group.foreach { case (b, i) =>
        argSets.zipWithIndex.foreach { case (m, row) =>
          val want = evalSwitch(b, m)
          val gi = got(row).fieldIndex(s"e$i")
          val gotV = if (got(row).isNullAt(gi)) None else Some(got(row).getInt(gi))
          assert(gotV === want,
            s"body ${renderSwitch(b)}\nsql ${JavaUdfShim.translate(renderSwitch(b), cqlArgs)}\nargs $m")
        }
      }
    }
  }

  // ── counted-loop grammar: int folds and StringBuilder appends ────────

  /** `int s = init; for (int i = lo; i </<= hi; i++) { s = e1; s = e2; }
    * return s;` — loop-body expressions are total (guarded args, + - *
    * only: Java would abort the whole call on /0 where the SQL fold nulls
    * one step, so division stays out of the loop grammar) and int + - *
    * agree mod 2^32 between Java's int ops and the fold's BIGINT-then-CAST
    * arithmetic.
    */
  private case class NumLoop(init: E, lo: Int, hi: E, incl: Boolean, steps: List[E])

  private def genLoopExpr(depth: Int): Gen[E] = {
    val leaves: Gen[E] = Gen.oneOf(
      Gen.chooseNum(-9, 9).map(Lit.apply),
      Gen.oneOf(argNames).map(GArg.apply),
      Gen.oneOf("s", "i").map(LRef.apply))
    if (depth <= 0) leaves
    else Gen.frequency(
      3 -> leaves,
      4 -> (for {
        op <- Gen.oneOf("+", "-", "*")
        l <- genLoopExpr(depth - 1); r <- genLoopExpr(depth - 1)
      } yield Bin(op, l, r)))
  }

  private def genNumLoop: Gen[NumLoop] = for {
    init <- genSafe(1)
    lo <- Gen.chooseNum(-2, 2)
    hi <- genSafe(1)
    incl <- Gen.oneOf(true, false)
    steps <- Gen.choose(1, 2).flatMap(n => Gen.listOfN(n, genLoopExpr(2)))
  } yield NumLoop(init, lo, hi, incl, steps)

  private def renderNumLoop(b: NumLoop): String = {
    val cmp = if (b.incl) "<=" else "<"
    val stmts = b.steps.map(e => s"s = ${render(e)};").mkString(" ")
    s"int s = ${render(b.init)}; " +
      s"for (int i = ${if (b.lo < 0) s"(${b.lo})" else b.lo}; i $cmp ${render(b.hi)}; i++) " +
      s"{ $stmts } return s;"
  }

  private def evalNumLoop(b: NumLoop, args: Map[String, Option[Int]]): Option[Int] = {
    var env: Map[String, Option[Int]] = Map("s" -> eval(b.init, args))
    val hiV = eval(b.hi, args).get // total by construction
    var i = b.lo
    while (if (b.incl) i <= hiV else i < hiV) {
      env = env.updated("i", Some(i))
      for (st <- b.steps) env = env.updated("s", eval(st, args, env))
      i += 1
    }
    env("s")
  }

  test("random counted int-fold loops translate with Java semantics " +
    "(including empty iteration ranges)") {
    import org.apache.spark.sql.functions.expr
    import spark.implicits._
    val cqlArgs = argNames.map(_ -> (CqlInt: CqlType))
    val argSets: Seq[Map[String, Option[Int]]] = Seq(
      Map("a" -> Some(7), "b" -> Some(-3), "c" -> Some(2)),
      Map("a" -> None, "b" -> Some(5), "c" -> Some(11)),
      Map("a" -> Some(0), "b" -> None, "c" -> Some(-8)))
    val base = argSets.map(m =>
      (m("a").map(Int.box).orNull, m("b").map(Int.box).orNull, m("c").map(Int.box).orNull))
      .toDF("a", "b", "c")
    val cases = (0 until 90).flatMap { i =>
      genNumLoop(Gen.Parameters.default.withSize(1 + i % 10), Seed(0x100FL + i))
    }
    cases.zipWithIndex.grouped(30).foreach { group =>
      val cols = group.map { case (b, i) =>
        val sql = JavaUdfShim.translate(renderNumLoop(b), cqlArgs)
        expr(sql).cast("int").as(s"e$i")
      }
      val got = base.select(cols: _*).collect()
      group.foreach { case (b, i) =>
        argSets.zipWithIndex.foreach { case (m, row) =>
          val want = evalNumLoop(b, m)
          val gi = got(row).fieldIndex(s"e$i")
          val gotV = if (got(row).isNullAt(gi)) None else Some(got(row).getInt(gi))
          assert(gotV === want,
            s"body ${renderNumLoop(b)}\nsql ${JavaUdfShim.translate(renderNumLoop(b), cqlArgs)}\nargs $m")
        }
      }
    }
  }

  // ── two-accumulator loop grammar (the named_struct fold) ─────────────

  /** `int s = i1; int t = i2; for (int i = lo; i </<= hi; i++) { <steps> }
    * return s * 31 + t;` — each step assigns one of the two accumulators
    * and its RHS may read BOTH (plus the loop variable), in Java's
    * sequential statement order: a later step sees the earlier step's
    * already-updated value, which is exactly what the struct fold must
    * thread. Total expressions only (+ - * on guarded args), like the
    * single-accumulator grammar.
    */
  private case class TwoLoop(initS: E, initT: E, lo: Int, hi: E, incl: Boolean,
                             steps: List[(String, E)])

  private def genTwoLoopExpr(depth: Int): Gen[E] = {
    val leaves: Gen[E] = Gen.oneOf(
      Gen.chooseNum(-9, 9).map(Lit.apply),
      Gen.oneOf(argNames).map(GArg.apply),
      Gen.oneOf("s", "t", "i").map(LRef.apply))
    if (depth <= 0) leaves
    else Gen.frequency(
      3 -> leaves,
      4 -> (for {
        op <- Gen.oneOf("+", "-", "*")
        l <- genTwoLoopExpr(depth - 1); r <- genTwoLoopExpr(depth - 1)
      } yield Bin(op, l, r)))
  }

  private def genTwoLoop: Gen[TwoLoop] = for {
    initS <- genSafe(1)
    initT <- genSafe(1)
    lo <- Gen.chooseNum(-2, 2)
    hi <- genSafe(1)
    incl <- Gen.oneOf(true, false)
    steps <- Gen.choose(2, 4).flatMap(n => Gen.listOfN(n,
      Gen.oneOf("s", "t").flatMap(tgt => genTwoLoopExpr(2).map(tgt -> _))))
  } yield TwoLoop(initS, initT, lo, hi, incl, steps)

  private def renderTwoLoop(b: TwoLoop): String = {
    val cmp = if (b.incl) "<=" else "<"
    val stmts = b.steps.map { case (tgt, e) => s"$tgt = ${render(e)};" }.mkString(" ")
    s"int s = ${render(b.initS)}; int t = ${render(b.initT)}; " +
      s"for (int i = ${if (b.lo < 0) s"(${b.lo})" else b.lo}; i $cmp ${render(b.hi)}; i++) " +
      s"{ $stmts } return s * 31 + t;"
  }

  private def evalTwoLoop(b: TwoLoop, args: Map[String, Option[Int]]): Option[Int] = {
    var env: Map[String, Option[Int]] =
      Map("s" -> eval(b.initS, args), "t" -> eval(b.initT, args))
    val hiV = eval(b.hi, args).get // total by construction
    var i = b.lo
    while (if (b.incl) i <= hiV else i < hiV) {
      env = env.updated("i", Some(i))
      for ((tgt, st) <- b.steps) env = env.updated(tgt, eval(st, args, env))
      i += 1
    }
    for (s <- env("s"); t <- env("t")) yield s * 31 + t
  }

  test("random two-accumulator counted loops translate to a struct fold " +
    "with Java sequential-statement semantics") {
    import org.apache.spark.sql.functions.expr
    import spark.implicits._
    val cqlArgs = argNames.map(_ -> (CqlInt: CqlType))
    val argSets: Seq[Map[String, Option[Int]]] = Seq(
      Map("a" -> Some(7), "b" -> Some(-3), "c" -> Some(2)),
      Map("a" -> None, "b" -> Some(5), "c" -> Some(11)),
      Map("a" -> Some(0), "b" -> None, "c" -> Some(-8)))
    val base = argSets.map(m =>
      (m("a").map(Int.box).orNull, m("b").map(Int.box).orNull, m("c").map(Int.box).orNull))
      .toDF("a", "b", "c")
    val cases = (0 until 60).flatMap { i =>
      genTwoLoop(Gen.Parameters.default.withSize(1 + i % 10), Seed(0x200FL + i))
    }
    cases.zipWithIndex.grouped(20).foreach { group =>
      val cols = group.map { case (b, i) =>
        val sql = JavaUdfShim.translate(renderTwoLoop(b), cqlArgs)
        expr(sql).cast("int").as(s"e$i")
      }
      val got = base.select(cols: _*).collect()
      group.foreach { case (b, i) =>
        argSets.zipWithIndex.foreach { case (m, row) =>
          val want = evalTwoLoop(b, m)
          val gi = got(row).fieldIndex(s"e$i")
          val gotV = if (got(row).isNullAt(gi)) None else Some(got(row).getInt(gi))
          assert(gotV === want,
            s"body ${renderTwoLoop(b)}\nsql ${JavaUdfShim.translate(renderTwoLoop(b), cqlArgs)}\nargs $m")
        }
      }
    }
  }

  /** [[TwoLoop]] with optionally GUARDED steps: `if ((l) < (r)) tgt = e;
    * [else tgt = e2;]` — the guard may read both accumulators and the
    * loop variable, and Java evaluates it per iteration at its statement
    * position, threading earlier statements' updates. Exercises the
    * loop-body if/else lowering (IF(cond, then', else') merge).
    */
  private case class CondStep(tgt: String, guard: Option[(E, E)], e: E, els: Option[E])
  private case class CondLoop(initS: E, initT: E, lo: Int, hi: E, incl: Boolean,
                              steps: List[CondStep])

  private def genCondStep: Gen[CondStep] = for {
    tgt <- Gen.oneOf("s", "t")
    guarded <- Gen.oneOf(true, false)
    guard <- if (guarded)
      Gen.zip(genTwoLoopExpr(1), genTwoLoopExpr(1)).map(Some(_))
    else Gen.const(None)
    e <- genTwoLoopExpr(2)
    els <- if (guarded) Gen.option(genTwoLoopExpr(2)) else Gen.const(None)
  } yield CondStep(tgt, guard, e, els)

  private def genCondLoop: Gen[CondLoop] = for {
    initS <- genSafe(1)
    initT <- genSafe(1)
    lo <- Gen.chooseNum(-2, 2)
    hi <- genSafe(1)
    incl <- Gen.oneOf(true, false)
    steps <- Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, genCondStep))
  } yield CondLoop(initS, initT, lo, hi, incl, steps)

  private def renderCondLoop(b: CondLoop): String = {
    val cmp = if (b.incl) "<=" else "<"
    val stmts = b.steps.map {
      case CondStep(tgt, None, e, _) => s"$tgt = ${render(e)};"
      case CondStep(tgt, Some((l, r)), e, None) =>
        s"if ((${render(l)}) < (${render(r)})) $tgt = ${render(e)};"
      case CondStep(tgt, Some((l, r)), e, Some(e2)) =>
        s"if ((${render(l)}) < (${render(r)})) $tgt = ${render(e)}; " +
          s"else $tgt = ${render(e2)};"
    }.mkString(" ")
    s"int s = ${render(b.initS)}; int t = ${render(b.initT)}; " +
      s"for (int i = ${if (b.lo < 0) s"(${b.lo})" else b.lo}; i $cmp ${render(b.hi)}; i++) " +
      s"{ $stmts } return s * 31 + t;"
  }

  private def evalCondLoop(b: CondLoop, args: Map[String, Option[Int]]): Option[Int] = {
    var env: Map[String, Option[Int]] =
      Map("s" -> eval(b.initS, args), "t" -> eval(b.initT, args))
    val hiV = eval(b.hi, args).get
    var i = b.lo
    while (if (b.incl) i <= hiV else i < hiV) {
      env = env.updated("i", Some(i))
      for (st <- b.steps) {
        val fire = st.guard match {
          case None => true
          case Some((l, r)) =>
            (eval(l, args, env), eval(r, args, env)) match {
              case (Some(lv), Some(rv)) => lv < rv
              case _ => false // total by construction; never hit
            }
        }
        if (fire) env = env.updated(st.tgt, eval(st.e, args, env))
        else st.els.foreach(e2 => env = env.updated(st.tgt, eval(e2, args, env)))
      }
      i += 1
    }
    for (s <- env("s"); t <- env("t")) yield s * 31 + t
  }

  test("random conditionally-guarded loop bodies translate with Java " +
    "sequential-statement semantics (guards read accumulators per iteration)") {
    import org.apache.spark.sql.functions.expr
    import spark.implicits._
    val cqlArgs = argNames.map(_ -> (CqlInt: CqlType))
    val argSets: Seq[Map[String, Option[Int]]] = Seq(
      Map("a" -> Some(7), "b" -> Some(-3), "c" -> Some(2)),
      Map("a" -> None, "b" -> Some(5), "c" -> Some(11)),
      Map("a" -> Some(0), "b" -> None, "c" -> Some(-8)))
    val base = argSets.map(m =>
      (m("a").map(Int.box).orNull, m("b").map(Int.box).orNull, m("c").map(Int.box).orNull))
      .toDF("a", "b", "c")
    val cases = (0 until 60).flatMap { i =>
      genCondLoop(Gen.Parameters.default.withSize(1 + i % 10), Seed(0x300FL + i))
    }
    cases.zipWithIndex.grouped(20).foreach { group =>
      val cols = group.map { case (b, i) =>
        val sql = JavaUdfShim.translate(renderCondLoop(b), cqlArgs)
        expr(sql).cast("int").as(s"e$i")
      }
      val got = base.select(cols: _*).collect()
      group.foreach { case (b, i) =>
        argSets.zipWithIndex.foreach { case (m, row) =>
          val want = evalCondLoop(b, m)
          val gi = got(row).fieldIndex(s"e$i")
          val gotV = if (got(row).isNullAt(gi)) None else Some(got(row).getInt(gi))
          assert(gotV === want,
            s"body ${renderCondLoop(b)}\nsql ${JavaUdfShim.translate(renderCondLoop(b), cqlArgs)}\nargs $m")
        }
      }
    }
  }

  private def renderWhileLoop(b: TwoLoop): String = {
    val cmp = if (b.incl) "<=" else "<"
    val stmts = b.steps.map { case (tgt, e) => s"$tgt = ${render(e)};" }.mkString(" ")
    s"int s = ${render(b.initS)}; int t = ${render(b.initT)}; " +
      s"int i = ${if (b.lo < 0) s"(${b.lo})" else b.lo.toString}; " +
      s"while (i $cmp ${render(b.hi)}) { $stmts i++; } " +
      "return (s * 31 + t) * 7 + i;"
  }

  private def evalWhileLoop(b: TwoLoop, args: Map[String, Option[Int]]): Option[Int] = {
    var env: Map[String, Option[Int]] =
      Map("s" -> eval(b.initS, args), "t" -> eval(b.initT, args))
    val hiV = eval(b.hi, args).get
    var i = b.lo
    while (if (b.incl) i <= hiV else i < hiV) {
      env = env.updated("i", Some(i))
      for ((tgt, st) <- b.steps) env = env.updated(tgt, eval(st, args, env))
      i += 1
    }
    for (s <- env("s"); t <- env("t")) yield (s * 31 + t) * 7 + i
  }

  test("random step-k counted loops (k in 2..4, two accumulators) " +
    "translate with Java semantics — sequence(lo, hi, k) walks exactly " +
    "the Java iterates under either bound form") {
    import org.apache.spark.sql.functions.expr
    import spark.implicits._
    def renderStep(b: TwoLoop, k: Int): String = {
      val cmp = if (b.incl) "<=" else "<"
      val stmts = b.steps.map { case (tgt, e) => s"$tgt = ${render(e)};" }.mkString(" ")
      s"int s = ${render(b.initS)}; int t = ${render(b.initT)}; " +
        s"for (int i = ${if (b.lo < 0) s"(${b.lo})" else b.lo.toString}; " +
        s"i $cmp ${render(b.hi)}; i += $k) { $stmts } return s * 31 + t;"
    }
    def evalStep(b: TwoLoop, k: Int, args: Map[String, Option[Int]]): Option[Int] = {
      var env: Map[String, Option[Int]] =
        Map("s" -> eval(b.initS, args), "t" -> eval(b.initT, args))
      val hiV = eval(b.hi, args).get
      var i = b.lo
      while (if (b.incl) i <= hiV else i < hiV) {
        env = env.updated("i", Some(i))
        for ((tgt, st) <- b.steps) env = env.updated(tgt, eval(st, args, env))
        i += k
      }
      for (s <- env("s"); t <- env("t")) yield s * 31 + t
    }
    val cqlArgs = argNames.map(_ -> (CqlInt: CqlType))
    val argSets: Seq[Map[String, Option[Int]]] = Seq(
      Map("a" -> Some(7), "b" -> Some(-3), "c" -> Some(2)),
      Map("a" -> None, "b" -> Some(5), "c" -> Some(11)),
      Map("a" -> Some(0), "b" -> None, "c" -> Some(-8)))
    val base = argSets.map(m =>
      (m("a").map(Int.box).orNull, m("b").map(Int.box).orNull, m("c").map(Int.box).orNull))
      .toDF("a", "b", "c")
    val cases = (0 until 30).flatMap { i =>
      genTwoLoop(Gen.Parameters.default.withSize(1 + i % 10), Seed(0x57E9L + i))
        .map(b => (b, 2 + i % 3))
    }
    cases.zipWithIndex.grouped(15).foreach { group =>
      val cols = group.map { case ((b, k), i) =>
        expr(JavaUdfShim.translate(renderStep(b, k), cqlArgs)).cast("int").as(s"e$i")
      }
      val got = base.select(cols: _*).collect()
      group.foreach { case ((b, k), i) =>
        argSets.zipWithIndex.foreach { case (m, row) =>
          val want = evalStep(b, k, m)
          val gi = got(row).fieldIndex(s"e$i")
          val gotV = if (got(row).isNullAt(gi)) None else Some(got(row).getInt(gi))
          assert(gotV === want,
            s"body ${renderStep(b, k)}\nsql ${JavaUdfShim.translate(renderStep(b, k), cqlArgs)}\nargs $m")
        }
      }
    }
  }

  test("random while-loops (two accumulators, POST-LOOP variable read) " +
    "translate with Java semantics via the counted-for desugar") {
    import org.apache.spark.sql.functions.expr
    import spark.implicits._
    val cqlArgs = argNames.map(_ -> (CqlInt: CqlType))
    val argSets: Seq[Map[String, Option[Int]]] = Seq(
      Map("a" -> Some(7), "b" -> Some(-3), "c" -> Some(2)),
      Map("a" -> None, "b" -> Some(5), "c" -> Some(11)),
      Map("a" -> Some(0), "b" -> None, "c" -> Some(-8)))
    val base = argSets.map(m =>
      (m("a").map(Int.box).orNull, m("b").map(Int.box).orNull, m("c").map(Int.box).orNull))
      .toDF("a", "b", "c")
    val cases = (0 until 40).flatMap { i =>
      genTwoLoop(Gen.Parameters.default.withSize(1 + i % 10), Seed(0x7713L + i))
    }
    cases.zipWithIndex.grouped(20).foreach { group =>
      val cols = group.map { case (b, i) =>
        val sql = JavaUdfShim.translate(renderWhileLoop(b), cqlArgs)
        expr(sql).cast("int").as(s"e$i")
      }
      val got = base.select(cols: _*).collect()
      group.foreach { case (b, i) =>
        argSets.zipWithIndex.foreach { case (m, row) =>
          val want = evalWhileLoop(b, m)
          val gi = got(row).fieldIndex(s"e$i")
          val gotV = if (got(row).isNullAt(gi)) None else Some(got(row).getInt(gi))
          assert(gotV === want,
            s"body ${renderWhileLoop(b)}\nsql ${JavaUdfShim.translate(renderWhileLoop(b), cqlArgs)}\nargs $m")
        }
      }
    }
    // directed: a NULL bound poisons the post-loop variable (Java would
    // NPE on the unbox), matching the fold's accumulator semantics —
    // Spark's null-skipping GREATEST must not smuggle the start back
    val nullBound = JavaUdfShim.translate(
      "int i = 0; int s = 0; while (i < a) { s += 1; i++; } return i;", cqlArgs)
    val nb = base.select(expr(nullBound).cast("int").as("v")).collect()
    assert(!nb(0).isNullAt(0) && nb(0).getInt(0) === 7) // a = 7 → i = 7
    assert(nb(1).isNullAt(0), s"null bound must poison: $nullBound") // a = null
  }

  /** Nested branches inside counted-loop bodies (the r13 grammar rung):
    * statements are assignments or `if`s whose branches recursively hold
    * more statements — depth-2 and depth-3 ifs lower to nested IF()
    * terms in the struct fold. Branches that are a single assignment
    * render unbraced; anything else braces, which also sidesteps Java's
    * dangling-else binding so the model and javac agree by construction.
    */
  private sealed trait LStmt
  private case class LAssign(tgt: String, e: E) extends LStmt
  private case class LIf(l: E, r: E, thn: List[LStmt], els: List[LStmt]) extends LStmt

  private def genLStmt(depth: Int): Gen[LStmt] = {
    val assign = for {
      tgt <- Gen.oneOf("s", "t"); e <- genTwoLoopExpr(2)
    } yield LAssign(tgt, e)
    if (depth <= 0) assign
    else Gen.frequency(
      2 -> assign,
      3 -> (for {
        l <- genTwoLoopExpr(1); r <- genTwoLoopExpr(1)
        nt <- Gen.choose(1, 2)
        thn <- Gen.listOfN(nt, genLStmt(depth - 1))
        hasElse <- Gen.oneOf(true, false)
        els <- if (hasElse)
          Gen.choose(1, 2).flatMap(n => Gen.listOfN(n, genLStmt(depth - 1)))
        else Gen.const(List.empty[LStmt])
      } yield LIf(l, r, thn, els)))
  }

  private case class NestedIfLoop(initS: E, initT: E, lo: Int, hi: E,
                                  incl: Boolean, steps: List[LStmt])

  private def genNestedIfLoop: Gen[NestedIfLoop] = for {
    initS <- genSafe(1)
    initT <- genSafe(1)
    lo <- Gen.chooseNum(-2, 2)
    hi <- genSafe(1)
    incl <- Gen.oneOf(true, false)
    n <- Gen.choose(1, 3)
    // force at least one nested if into every case: this test exists to
    // cover the depth-2+ grammar, not to re-run the flat cond-loop one
    forced <- for {
      l <- genTwoLoopExpr(1); r <- genTwoLoopExpr(1)
      il <- genTwoLoopExpr(1); ir <- genTwoLoopExpr(1)
      a1 <- genLStmt(0); a2 <- genLStmt(0); a3 <- genLStmt(1)
      deepElse <- Gen.oneOf(true, false)
    } yield LIf(l, r,
      List(LIf(il, ir, List(a1), if (deepElse) List(a3) else Nil)),
      List(a2))
    rest <- Gen.listOfN(n - 1, genLStmt(2))
  } yield NestedIfLoop(initS, initT, lo, hi, incl, forced :: rest)

  private def renderLStmt(s: LStmt): String = s match {
    case LAssign(t, e) => s"$t = ${render(e)};"
    case LIf(l, r, thn, els) =>
      val tb = thn match {
        case (a: LAssign) :: Nil => renderLStmt(a)
        case _ => thn.map(renderLStmt).mkString("{ ", " ", " }")
      }
      val eb = els match {
        case Nil => ""
        case (a: LAssign) :: Nil => s" else ${renderLStmt(a)}"
        case _ => s" else ${els.map(renderLStmt).mkString("{ ", " ", " }")}"
      }
      s"if ((${render(l)}) < (${render(r)})) $tb$eb"
  }

  private def renderNestedIfLoop(b: NestedIfLoop): String = {
    val cmp = if (b.incl) "<=" else "<"
    s"int s = ${render(b.initS)}; int t = ${render(b.initT)}; " +
      s"for (int i = ${if (b.lo < 0) s"(${b.lo})" else b.lo}; i $cmp ${render(b.hi)}; i++) " +
      s"{ ${b.steps.map(renderLStmt).mkString(" ")} } return s * 31 + t;"
  }

  private def evalLStmt(s: LStmt, args: Map[String, Option[Int]],
                        env: Map[String, Option[Int]]): Map[String, Option[Int]] =
    s match {
      case LAssign(t, e) => env.updated(t, eval(e, args, env))
      case LIf(l, r, thn, els) =>
        val fire = (eval(l, args, env), eval(r, args, env)) match {
          case (Some(lv), Some(rv)) => lv < rv
          case _ => false // total by construction; never hit
        }
        (if (fire) thn else els).foldLeft(env)((en, st) => evalLStmt(st, args, en))
    }

  private def evalNestedIfLoop(b: NestedIfLoop,
                               args: Map[String, Option[Int]]): Option[Int] = {
    var env: Map[String, Option[Int]] =
      Map("s" -> eval(b.initS, args), "t" -> eval(b.initT, args))
    val hiV = eval(b.hi, args).get
    var i = b.lo
    while (if (b.incl) i <= hiV else i < hiV) {
      env = env.updated("i", Some(i))
      env = b.steps.foldLeft(env)((en, st) => evalLStmt(st, args, en))
      i += 1
    }
    for (s <- env("s"); t <- env("t")) yield s * 31 + t
  }

  test("random NESTED-branch loop bodies (if within if, both arms, " +
    "braced and unbraced) translate to nested IF() terms with Java " +
    "sequential-statement semantics") {
    import org.apache.spark.sql.functions.expr
    import spark.implicits._
    val cqlArgs = argNames.map(_ -> (CqlInt: CqlType))
    val argSets: Seq[Map[String, Option[Int]]] = Seq(
      Map("a" -> Some(7), "b" -> Some(-3), "c" -> Some(2)),
      Map("a" -> None, "b" -> Some(5), "c" -> Some(11)),
      Map("a" -> Some(0), "b" -> None, "c" -> Some(-8)))
    val base = argSets.map(m =>
      (m("a").map(Int.box).orNull, m("b").map(Int.box).orNull, m("c").map(Int.box).orNull))
      .toDF("a", "b", "c")
    val cases = (0 until 60).flatMap { i =>
      genNestedIfLoop(Gen.Parameters.default.withSize(1 + i % 10), Seed(0x1300FL + i))
    }
    cases.zipWithIndex.grouped(20).foreach { group =>
      val cols = group.map { case (b, i) =>
        val sql = JavaUdfShim.translate(renderNestedIfLoop(b), cqlArgs)
        expr(sql).cast("int").as(s"e$i")
      }
      val got = base.select(cols: _*).collect()
      group.foreach { case (b, i) =>
        argSets.zipWithIndex.foreach { case (m, row) =>
          val want = evalNestedIfLoop(b, m)
          val gi = got(row).fieldIndex(s"e$i")
          val gotV = if (got(row).isNullAt(gi)) None else Some(got(row).getInt(gi))
          assert(gotV === want,
            s"body ${renderNestedIfLoop(b)}\nsql ${JavaUdfShim.translate(renderNestedIfLoop(b), cqlArgs)}\nargs $m")
        }
      }
    }
  }

  /** StringBuilder repeat-append loops (the UFTest.java:441 shape):
    * append operands are leaves only — a null Integer append prints "null"
    * on both sides, a null unboxed in arithmetic would NPE in Java.
    */
  private sealed trait SbItem
  private case class SbLit(v: Int) extends SbItem
  private case class SbArg(n: String) extends SbItem
  private case object SbI extends SbItem
  private case class SbStr(s: String) extends SbItem

  private case class SbLoop(lo: Int, hi: E, incl: Boolean,
                            appends: List[SbItem], chained: Boolean)

  private def genSbLoop: Gen[SbLoop] = for {
    lo <- Gen.chooseNum(-1, 2)
    hi <- genSafe(1)
    incl <- Gen.oneOf(true, false)
    appends <- Gen.choose(1, 3).flatMap(n => Gen.listOfN(n, Gen.oneOf(
      Gen.chooseNum(-9, 9).map(SbLit.apply),
      Gen.oneOf(argNames).map(SbArg.apply),
      Gen.const(SbI),
      Gen.oneOf("x", "-", "#").map(SbStr.apply))))
    chained <- Gen.oneOf(true, false)
  } yield SbLoop(lo, hi, incl, appends, chained)

  private def renderSbItem(it: SbItem): String = it match {
    case SbLit(v) if v < 0 => s"($v)"
    case SbLit(v) => v.toString
    case SbArg(n) => n
    case SbI => "i"
    case SbStr(s) => "\"" + s + "\""
  }

  private def renderSbLoop(b: SbLoop): String = {
    val cmp = if (b.incl) "<=" else "<"
    val body =
      if (b.chained) s"sb${b.appends.map(a => s".append(${renderSbItem(a)})").mkString};"
      else b.appends.map(a => s"sb.append(${renderSbItem(a)});").mkString(" ")
    s"StringBuilder sb = new StringBuilder(); " +
      s"for (int i = ${if (b.lo < 0) s"(${b.lo})" else b.lo}; i $cmp ${render(b.hi)}; i++) " +
      s"{ $body } return sb.toString();"
  }

  private def evalSbLoop(b: SbLoop, args: Map[String, Option[Int]]): String = {
    val sb = new StringBuilder
    val hiV = eval(b.hi, args).get
    var i = b.lo
    while (if (b.incl) i <= hiV else i < hiV) {
      b.appends.foreach {
        case SbLit(v) => sb.append(v)
        case SbArg(n) => sb.append(args(n).map(_.toString).getOrElse("null"))
        case SbI => sb.append(i)
        case SbStr(s) => sb.append(s)
      }
      i += 1
    }
    sb.result()
  }

  test("random StringBuilder repeat loops (UFTest.java:441 shape) translate " +
    "with Java append semantics") {
    import org.apache.spark.sql.functions.expr
    import spark.implicits._
    val cqlArgs = argNames.map(_ -> (CqlInt: CqlType))
    val argSets: Seq[Map[String, Option[Int]]] = Seq(
      Map("a" -> Some(7), "b" -> Some(-3), "c" -> Some(2)),
      Map("a" -> None, "b" -> Some(5), "c" -> Some(11)))
    val base = argSets.map(m =>
      (m("a").map(Int.box).orNull, m("b").map(Int.box).orNull, m("c").map(Int.box).orNull))
      .toDF("a", "b", "c")
    val cases = (0 until 60).flatMap { i =>
      genSbLoop(Gen.Parameters.default.withSize(1 + i % 10), Seed(0x5BL + i))
    }
    cases.zipWithIndex.grouped(30).foreach { group =>
      val cols = group.map { case (b, i) =>
        val sql = JavaUdfShim.translate(renderSbLoop(b), cqlArgs)
        expr(sql).as(s"e$i")
      }
      val got = base.select(cols: _*).collect()
      group.foreach { case (b, i) =>
        argSets.zipWithIndex.foreach { case (m, row) =>
          val want = evalSbLoop(b, m)
          val gi = got(row).fieldIndex(s"e$i")
          assert(!got(row).isNullAt(gi) && got(row).getString(gi) === want,
            s"body ${renderSbLoop(b)}\nsql ${JavaUdfShim.translate(renderSbLoop(b), cqlArgs)}\nargs $m")
        }
      }
    }
  }

  test("random Java statement bodies (decls + if/return chains) translate " +
    "with Java semantics") {
    import org.apache.spark.sql.functions.expr
    import spark.implicits._
    val cqlArgs = argNames.map(_ -> (CqlInt: CqlType))
    val argSets: Seq[Map[String, Option[Int]]] = Seq(
      Map("a" -> Some(7), "b" -> Some(-3), "c" -> Some(2)),
      Map("a" -> None, "b" -> Some(5), "c" -> Some(11)),
      Map("a" -> Some(0), "b" -> None, "c" -> Some(-8)))
    val base = argSets.map(m =>
      (m("a").map(Int.box).orNull, m("b").map(Int.box).orNull, m("c").map(Int.box).orNull))
      .toDF("a", "b", "c")
    val cases = (0 until 120).flatMap { i =>
      genBody(Gen.Parameters.default.withSize(1 + i % 10), Seed(0xB0D1E5L + i))
    }
    cases.zipWithIndex.grouped(40).foreach { group =>
      val cols = group.map { case (b, i) =>
        val sql = JavaUdfShim.translate(renderBody(b), cqlArgs)
        expr(sql).cast("int").as(s"e$i")
      }
      val got = base.select(cols: _*).collect()
      group.foreach { case (b, i) =>
        argSets.zipWithIndex.foreach { case (m, row) =>
          val want = evalBody(b, m)
          val gi = got(row).fieldIndex(s"e$i")
          val gotV = if (got(row).isNullAt(gi)) None else Some(got(row).getInt(gi))
          assert(gotV === want,
            s"body ${renderBody(b)}\nsql ${JavaUdfShim.translate(renderBody(b), cqlArgs)}\nargs $m")
        }
      }
    }
  }

  test("random Java int expressions translate to SQL with Java semantics " +
    "(truncating division, null propagation, wrapping arithmetic)") {
    import org.apache.spark.sql.functions.{col, expr}
    import spark.implicits._
    val cqlArgs = argNames.map(_ -> (CqlInt: CqlType))
    val argSets: Seq[Map[String, Option[Int]]] = Seq(
      Map("a" -> Some(7), "b" -> Some(-3), "c" -> Some(2)),
      Map("a" -> None, "b" -> Some(5), "c" -> Some(11)),
      Map("a" -> Some(0), "b" -> None, "c" -> Some(-8)))
    val cases = (0 until 120).flatMap { i =>
      genExpr(3)(Gen.Parameters.default.withSize(1 + i % 10), Seed(0xCAFE0L + i))
    }
    // one Spark job for ALL cases: each translated expression becomes a
    // column over a 3-row frame of the arg sets
    val base = argSets.map(m =>
      (m("a").map(Int.box).orNull, m("b").map(Int.box).orNull, m("c").map(Int.box).orNull))
      .toDF("a", "b", "c")
    cases.zipWithIndex.grouped(40).foreach { group =>
      val cols = group.map { case (e, i) =>
        val sql = JavaUdfShim.translate(s"return ${render(e)};", cqlArgs)
        expr(sql).cast("int").as(s"e$i")
      }
      val got = base.select(cols: _*).collect()
      group.foreach { case (e, i) =>
        argSets.zipWithIndex.foreach { case (m, row) =>
          val want = eval(e, m)
          val gi = got(row).fieldIndex(s"e$i")
          val gotV = if (got(row).isNullAt(gi)) None else Some(got(row).getInt(gi))
          // divisions-by-zero poison differently in nested guards only when
          // Java would have short-circuited — both sides model it as None,
          // so direct comparison holds
          assert(gotV === want,
            s"expr ${render(e)}\nsql ${JavaUdfShim.translate(s"return ${render(e)};", cqlArgs)}\nargs $m")
        }
      }
    }
  }

  // ── NESTED counted loops (recursive fold lowering) ────────────────────

  /** `int s = i1; int t = i2; for (int i = lo1; i c1 h1; i++) { [pre]
    * for (int j = lo2; j c2 h2; j++) { inner } [post] } return s*31+t;`
    * — the inner bound may read the outer loop variable (and guarded
    * args), which Java re-evaluates per outer iteration; inner/pre/post
    * steps assign either accumulator and may read both plus i (and j
    * inside the inner body), threading sequentially.
    */
  private case class NestedLoop(initS: E, initT: E,
                                lo1: Int, hi1: E, incl1: Boolean,
                                lo2: Int, hi2: E, incl2: Boolean,
                                pre: List[(String, E)],
                                inner: List[(String, E)],
                                post: List[(String, E)])

  private def genNestedStep(withJ: Boolean): Gen[(String, E)] = {
    val refs = if (withJ) Seq("s", "t", "i", "j") else Seq("s", "t", "i")
    def ex(depth: Int): Gen[E] = {
      val leaves: Gen[E] = Gen.oneOf(
        Gen.chooseNum(-9, 9).map(Lit.apply),
        Gen.oneOf(argNames).map(GArg.apply),
        Gen.oneOf(refs).map(LRef.apply))
      if (depth <= 0) leaves
      else Gen.frequency(
        3 -> leaves,
        4 -> (for {
          op <- Gen.oneOf("+", "-", "*")
          l <- ex(depth - 1); r <- ex(depth - 1)
        } yield Bin(op, l, r)))
    }
    for { tgt <- Gen.oneOf("s", "t"); e <- ex(2) } yield tgt -> e
  }

  /** Inner bound: literals, guarded args, and the OUTER loop variable —
    * never an accumulator (the inner body mutates them, which the shim
    * correctly rejects as data-dependent).
    */
  private def genInnerBound: Gen[E] = Gen.frequency(
    2 -> Gen.chooseNum(-2, 4).map(Lit.apply),
    1 -> Gen.oneOf(argNames).map(GArg.apply),
    2 -> Gen.const(LRef("i")),
    2 -> (for {
      op <- Gen.oneOf("+", "-")
      r <- Gen.chooseNum(0, 3).map(Lit.apply)
    } yield Bin(op, LRef("i"), r)))

  private def genNestedLoop: Gen[NestedLoop] = for {
    initS <- genSafe(1)
    initT <- genSafe(1)
    lo1 <- Gen.chooseNum(-1, 2)
    hi1 <- genSafe(1)
    incl1 <- Gen.oneOf(true, false)
    lo2 <- Gen.chooseNum(-1, 2)
    hi2 <- genInnerBound
    incl2 <- Gen.oneOf(true, false)
    pre <- Gen.choose(0, 1).flatMap(n => Gen.listOfN(n, genNestedStep(withJ = false)))
    inner <- Gen.choose(1, 2).flatMap(n => Gen.listOfN(n, genNestedStep(withJ = true)))
    post <- Gen.choose(0, 1).flatMap(n => Gen.listOfN(n, genNestedStep(withJ = false)))
  } yield NestedLoop(initS, initT, lo1, hi1, incl1, lo2, hi2, incl2, pre, inner, post)

  private def renderNestedLoop(b: NestedLoop): String = {
    val c1 = if (b.incl1) "<=" else "<"
    val c2 = if (b.incl2) "<=" else "<"
    def stmts(ss: List[(String, E)]) =
      ss.map { case (tgt, e) => s"$tgt = ${render(e)};" }.mkString(" ")
    s"int s = ${render(b.initS)}; int t = ${render(b.initT)}; " +
      s"for (int i = ${if (b.lo1 < 0) s"(${b.lo1})" else b.lo1}; i $c1 ${render(b.hi1)}; i++) { " +
      stmts(b.pre) +
      s" for (int j = ${if (b.lo2 < 0) s"(${b.lo2})" else b.lo2}; j $c2 ${render(b.hi2)}; j++) { " +
      stmts(b.inner) + " } " + stmts(b.post) +
      " } return s * 31 + t;"
  }

  private def evalNestedLoop(b: NestedLoop, args: Map[String, Option[Int]]): Option[Int] = {
    var env: Map[String, Option[Int]] =
      Map("s" -> eval(b.initS, args), "t" -> eval(b.initT, args))
    val h1 = eval(b.hi1, args).get // total by construction
    var i = b.lo1
    while (if (b.incl1) i <= h1 else i < h1) {
      env = env.updated("i", Some(i))
      for ((tgt, st) <- b.pre) env = env.updated(tgt, eval(st, args, env))
      val h2 = eval(b.hi2, args, env).get // reads i at the CURRENT iteration
      var j = b.lo2
      while (if (b.incl2) j <= h2 else j < h2) {
        env = env.updated("j", Some(j))
        for ((tgt, st) <- b.inner) env = env.updated(tgt, eval(st, args, env))
        j += 1
      }
      env = env - "j"
      for ((tgt, st) <- b.post) env = env.updated(tgt, eval(st, args, env))
      i += 1
    }
    for (s <- env("s"); t <- env("t")) yield s * 31 + t
  }

  test("random NESTED counted loops translate recursively with Java " +
    "semantics: inner bounds read the outer variable per iteration, " +
    "accumulators thread through both folds") {
    import org.apache.spark.sql.functions.expr
    import spark.implicits._
    val cqlArgs = argNames.map(_ -> (CqlInt: CqlType))
    val argSets: Seq[Map[String, Option[Int]]] = Seq(
      Map("a" -> Some(4), "b" -> Some(-2), "c" -> Some(3)),
      Map("a" -> None, "b" -> Some(2), "c" -> Some(5)),
      Map("a" -> Some(1), "b" -> None, "c" -> Some(-3)))
    val base = argSets.map(m =>
      (m("a").map(Int.box).orNull, m("b").map(Int.box).orNull, m("c").map(Int.box).orNull))
      .toDF("a", "b", "c")
    val cases = (0 until 60).flatMap { i =>
      genNestedLoop(Gen.Parameters.default.withSize(1 + i % 10), Seed(0x300FL + i))
    }
    assert(cases.size >= 50, "generator must produce the sweep")
    cases.zipWithIndex.grouped(15).foreach { group =>
      val cols = group.map { case (b, i) =>
        val sql = JavaUdfShim.translate(renderNestedLoop(b), cqlArgs)
        expr(sql).cast("int").as(s"e$i")
      }
      val got = base.select(cols: _*).collect()
      group.foreach { case (b, i) =>
        argSets.zipWithIndex.foreach { case (m, row) =>
          val want = evalNestedLoop(b, m)
          val gi = got(row).fieldIndex(s"e$i")
          val gotV = if (got(row).isNullAt(gi)) None else Some(got(row).getInt(gi))
          assert(gotV === want,
            s"body ${renderNestedLoop(b)}\nsql ${JavaUdfShim.translate(renderNestedLoop(b), cqlArgs)}\nargs $m")
        }
      }
    }
  }

  test("lastIndexOf and Math.floorDiv/floorMod translate with Java " +
    "semantics over random operands (negatives, zero divisor, empty " +
    "and missing needles)") {
    import org.apache.spark.sql.functions.expr
    import spark.implicits._
    val rnd = new scala.util.Random(0xF100D)
    val one = Seq(Tuple1(1)).toDF("dummy")
    // floorDiv/floorMod vs java.lang.Math — zero divisor models as NULL
    val divCases = (0 until 80).map { _ =>
      (rnd.nextInt(41) - 20, rnd.nextInt(9) - 4)
    }
    val divCols = divCases.zipWithIndex.flatMap { case ((a, b), i) =>
      Seq(expr(JavaUdfShim.translate(s"return Math.floorDiv(($a), ($b));", Nil))
            .cast("long").as(s"d$i"),
          expr(JavaUdfShim.translate(s"return Math.floorMod(($a), ($b));", Nil))
            .cast("long").as(s"m$i"))
    }
    val row = one.select(divCols: _*).head()
    divCases.zipWithIndex.foreach { case ((a, b), i) =>
      val (gd, gm) = (row.fieldIndex(s"d$i"), row.fieldIndex(s"m$i"))
      if (b == 0) assert(row.isNullAt(gd) && row.isNullAt(gm), s"($a, 0)")
      else {
        assert(row.getLong(gd) === Math.floorDiv(a, b).toLong, s"floorDiv($a, $b)")
        assert(row.getLong(gm) === Math.floorMod(a, b).toLong, s"floorMod($a, $b)")
      }
    }
    // lastIndexOf vs java.lang.String — small alphabet forces repeats
    val strCases = (0 until 60).map { _ =>
      val s = Seq.fill(rnd.nextInt(8))("ab".charAt(rnd.nextInt(2))).mkString
      val n = Seq.fill(rnd.nextInt(3))("ab".charAt(rnd.nextInt(2))).mkString
      (s, n)
    } :+ (("", "")) :+ (("ab", "")) :+ (("", "a"))
    val liCols = strCases.zipWithIndex.map { case ((s, n), i) =>
      expr(JavaUdfShim.translate(s"""return "$s".lastIndexOf("$n");""", Nil))
        .cast("int").as(s"l$i")
    }
    val lrow = one.select(liCols: _*).head()
    strCases.zipWithIndex.foreach { case ((s, n), i) =>
      assert(lrow.getInt(lrow.fieldIndex(s"l$i")) === s.lastIndexOf(n),
        s"'$s'.lastIndexOf('$n')")
    }
  }

  // ── char / String-method rung (r14): ground truth is Scala's own
  // String methods, which ARE Java's ─────────────────────────────────

  test("char literals, charAt and two-arg indexOf translate with Java " +
    "semantics: code-point widening in arithmetic and numeric compares, " +
    "string comparison between chars, char append in string context") {
    import org.apache.spark.sql.functions.expr
    import spark.implicits._
    val cqlArgs = Seq("s" -> (CqlText: CqlType), "k" -> (CqlInt: CqlType))
    val rowsIn = Seq(("alpha", 0), ("Bravo x", 1), ("zz", 2), ("m", 3))
    val base = rowsIn.toDF("s", "k")
    val rnd = new scala.util.Random(0xC4A7)
    // each case: (java body, expected value per (s, k) as Any; null never
    // arises — every receiver/index below is total over the fixture rows)
    val cases: Seq[(String, (String, Int) => Any)] = (0 until 40).flatMap { _ =>
      val c = ('a' + rnd.nextInt(26)).toChar
      val d = ('a' + rnd.nextInt(26)).toChar
      val f = rnd.nextInt(8) - 2 // negative froms behave as 0 in Java
      Seq[(String, (String, Int) => Any)](
        (s"return s.charAt(k % s.length());",
          (s, k) => s.charAt(k % s.length).toInt),
        (s"return s.charAt(0) == '$c';", (s, _) => s.charAt(0) == c),
        (s"return s.charAt(0) < '$c';", (s, _) => s.charAt(0) < c),
        (s"return s.charAt(k % s.length()) + 7;",
          (s, k) => s.charAt(k % s.length) + 7),
        (s"""return "p:" + s.charAt(0) + '$c';""",
          (s, _) => "p:" + s.charAt(0) + c),
        (s"""return s.indexOf("$c", $f);""", (s, _) => s.indexOf(c.toString, f)),
        (s"char x = s.charAt(0); return x == '$c' ? 1 : 0;",
          (s, _) => if (s.charAt(0) == c) 1 else 0),
        (s"int x = '$c'; return x + k;", (_, k) => c.toInt + k),
        (s"return ('$c' + 1) - '$d';", (_, _) => (c + 1) - d),
        (s"return '$c' <= $f;", (_, _) => c.toInt <= f))
    }
    cases.zipWithIndex.grouped(40).foreach { group =>
      val cols = group.map { case ((body, _), i) =>
        expr(JavaUdfShim.translate(body, cqlArgs)).as(s"e$i")
      }
      val got = base.select(cols: _*).collect()
      group.foreach { case ((body, want), i) =>
        rowsIn.zipWithIndex.foreach { case ((s, k), row) =>
          val gi = got(row).fieldIndex(s"e$i")
          val gotV = got(row).get(gi) match {
            case l: Long => l.toInt // SQL integer widths normalize to Int
            case other => other
          }
          assert(gotV === want(s, k),
            s"body $body\nsql ${JavaUdfShim.translate(body, cqlArgs)}\ns=$s k=$k")
        }
      }
    }
  }

  // ── array lookup tables ───────────────────────────────────────────────

  /** `int[] t = {e0, …, ek-1}; return t[((idx) % k + k) % k];` — the
    * double-mod keeps the index total and in bounds, so Java and SQL
    * agree on the selected element. Elements are TOTAL (guarded args, no
    * division): Java evaluates EVERY initializer at construction, so a
    * /0 in an unselected element would abort the whole Java call while
    * the SQL array just nulls that slot — the same reason division stays
    * out of the loop grammar. OOB/null-index behavior is pinned by the
    * deterministic test below instead.
    */
  private case class ArrCase(elems: List[E], idx: E)

  private def genArr: Gen[ArrCase] = for {
    k <- Gen.choose(1, 5)
    elems <- Gen.listOfN(k, genSafe(2))
    idx <- genSafe(2)
  } yield ArrCase(elems, idx)

  private def renderArr(b: ArrCase): String = {
    val k = b.elems.length
    s"int[] t = {${b.elems.map(render).mkString(", ")}}; " +
      s"return t[((${render(b.idx)}) % $k + $k) % $k];"
  }

  private def evalArr(b: ArrCase, args: Map[String, Option[Int]]): Option[Int] = {
    val k = b.elems.length
    val i = eval(b.idx, args).get // total by construction
    eval(b.elems(((i % k) + k) % k), args)
  }

  test("random array lookup tables translate with Java semantics: the " +
    "double-mod index selects the same element across arg sets") {
    import org.apache.spark.sql.functions.expr
    import spark.implicits._
    val cqlArgs = argNames.map(_ -> (CqlInt: CqlType))
    val argSets: Seq[Map[String, Option[Int]]] = Seq(
      Map("a" -> Some(7), "b" -> Some(-3), "c" -> Some(2)),
      Map("a" -> None, "b" -> Some(5), "c" -> Some(11)),
      Map("a" -> Some(-14), "b" -> None, "c" -> Some(0)))
    val base = argSets.map(m =>
      (m("a").map(Int.box).orNull, m("b").map(Int.box).orNull, m("c").map(Int.box).orNull))
      .toDF("a", "b", "c")
    val cases = (0 until 90).flatMap { i =>
      genArr(Gen.Parameters.default.withSize(1 + i % 8), Seed(0xA88A1L + i))
    }
    cases.zipWithIndex.grouped(30).foreach { group =>
      val cols = group.map { case (b, i) =>
        val sql = JavaUdfShim.translate(renderArr(b), cqlArgs)
        expr(sql).cast("int").as(s"e$i")
      }
      val got = base.select(cols: _*).collect()
      group.foreach { case (b, i) =>
        argSets.zipWithIndex.foreach { case (m, row) =>
          val want = evalArr(b, m)
          val gi = got(row).fieldIndex(s"e$i")
          val gotV = if (got(row).isNullAt(gi)) None else Some(got(row).getInt(gi))
          assert(gotV === want,
            s"body ${renderArr(b)}\nsql ${JavaUdfShim.translate(renderArr(b), cqlArgs)}\nargs $m")
        }
      }
    }
  }

  test("tolerant-parse try/catch end-to-end: the SQL catch branch fires " +
    "exactly where the REAL Integer.parseInt throws") {
    import org.apache.spark.sql.functions.expr
    import spark.implicits._
    val sql = JavaUdfShim.translate(
      "try { return Integer.parseInt(s); } catch (NumberFormatException e) " +
        "{ return -99; }", Seq("s" -> CqlText))
    val inputs: Seq[Option[String]] = Seq(
      Some("42"), Some("-7"), Some("+8"), Some("12.5"), Some(" 12"),
      Some("12 "), Some(""), Some("abc"), Some("2147483647"),
      Some("2147483648"), Some("-2147483648"), Some("0x1F"), Some("1e3"),
      None)
    val want = inputs.map { o =>
      o.map { s =>
        try Integer.parseInt(s)
        catch { case _: NumberFormatException => -99 }
      }.getOrElse(-99) // Java parseInt(null) throws NFE → catch
    }
    val got = inputs.toDF("s").select(expr(sql).cast("int")).collect()
      .map(_.getInt(0)).toSeq
    assert(got === want)
  }

  test("array indexing end-to-end: in-bounds reads evaluate, a null " +
    "index nulls, out-of-bounds raises like Java's AIOOBE") {
    import org.apache.spark.sql.functions.expr
    import spark.implicits._
    val sql = JavaUdfShim.translate("int[] t = {7, 11, 13}; return t[a];",
      Seq("a" -> CqlInt))
    val got = Seq[Option[Int]](Some(0), Some(2), None).toDF("a")
      .select(expr(sql).cast("int")).collect()
    assert(got.map(r => if (r.isNullAt(0)) None else Some(r.getInt(0))).toSeq ===
      Seq(Some(7), Some(13), None))
    val oob = intercept[Exception] {
      Seq(5).toDF("a").select(expr(sql)).collect()
    }
    assert(oob.getMessage.contains("Array index out of bounds"), oob.getMessage)
  }
}
