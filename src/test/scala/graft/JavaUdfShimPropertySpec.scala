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
}
