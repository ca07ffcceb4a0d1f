package graft.cql

import java.security.MessageDigest

import graft.cql.Ast._
import org.apache.spark.sql.DataFrame

/** Prepared-statement surface (reference `QueryProcessor.java:460-490`,
  * `transport/messages/ExecuteMessage.java`): statements parse once, cache
  * by MD5 digest of (keyspace, CQL string), and execute with bind values
  * substituted — positional `?` markers or named `:name` markers (a
  * repeated name binds once, at its first index).
  *
  * The session keyspace is PINNED at prepare time (QueryProcessor
  * .computeId hashes keyspace + query; StatementRestrictions resolve
  * against the prepare-time keyspace): `USE other` after `prepare` does
  * not change which table an unqualified prepared name addresses, and the
  * same query prepared under two keyspaces yields two distinct ids.
  */
final class PreparedStatements(engine: CqlEngine) {

  final case class Prepared(id: String, statement: Statement, numBinds: Int,
                            bindNames: Seq[Option[String]], keyspace: String)

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Prepared]()

  private def digest(cql: String): String =
    MessageDigest.getInstance("MD5").digest(cql.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Parse + cache; returns the statement id (the reference returns the MD5
    * digest of keyspace + query to the client the same way).
    */
  def prepare(cql: String): Prepared = {
    val ks = engine.currentKeyspace
    val p = cache.computeIfAbsent(digest(ks + " " + cql), id => {
      val (stmt, n, names) = CqlParser.parseWithBinds(cql, Map.empty)
      Prepared(id, stmt, n, names, ks)
    })
    // surfaces in system.prepared_statements, like the reference's
    // persisted prepared cache (db/SystemKeyspace.java:108,299)
    engine.notePrepared(p.id, p.keyspace, cql)
    p
  }

  /** Execute a prepared id with positional bind values. */
  def execute(id: String, binds: Any*): DataFrame = {
    val prep = Option(cache.get(id)).getOrElse(
      throw engine.InvalidRequest(s"Prepared query with ID $id not found"))
    if (binds.length != prep.numBinds)
      throw engine.InvalidRequest(
        s"Invalid amount of bind variables: expected ${prep.numBinds}, got ${binds.length}")
    engine.noteStatement()
    engine.runPinned(prep.keyspace, bind(prep.statement, binds.toIndexedSeq))
  }

  /** Execute a prepared id with named bind values (`:name` markers). */
  def executeNamed(id: String, binds: Map[String, Any]): DataFrame = {
    val prep = Option(cache.get(id)).getOrElse(
      throw engine.InvalidRequest(s"Prepared query with ID $id not found"))
    val positional = prep.bindNames.zipWithIndex.map {
      case (Some(n), _) => binds.getOrElse(n,
        throw engine.InvalidRequest(s"Missing value for bind marker :$n"))
      case (None, i) => throw engine.InvalidRequest(
        s"Positional marker at index $i cannot be bound by name")
    }
    engine.noteStatement()
    engine.runPinned(prep.keyspace, bind(prep.statement, positional.toIndexedSeq))
  }

  private def toLiteral(v: Any): Literal = v match {
    case null => NullLit
    case i: Int => IntLit(i.toLong)
    case l: Long => IntLit(l)
    case d: Double => DoubleLit(d)
    case f: Float => DoubleLit(f.toDouble)
    case s: String => StringLit(s)
    case b: Boolean => BoolLit(b)
    case b: Array[Byte] => BlobLit(b)
    case xs: Seq[_] => ListLit(xs.map(toLiteral))
    case m: Map[_, _] => MapLit(m.toSeq.map { case (k, vv) => toLiteral(k) -> toLiteral(vv) })
    case other => throw engine.InvalidRequest(s"Unsupported bind value: $other")
  }

  private def bind(stmt: Statement, binds: IndexedSeq[Any]): Statement = {
    def lit(l: Literal): Literal = l match {
      case BindMarker(i) => toLiteral(binds(i))
      case ListLit(xs) => ListLit(xs.map(lit))
      case SetLit(xs) => SetLit(xs.map(lit))
      case MapLit(ps) => MapLit(ps.map { case (k, v) => lit(k) -> lit(v) })
      case TupleLit(xs) => TupleLit(xs.map(lit))
      case UdtLit(fs) => UdtLit(fs.map { case (f, v) => f -> lit(v) })
      case FnLit(f, args) => FnLit(f, args.map(lit))
      case CollectionOpLit(op, pl) => CollectionOpLit(op, lit(pl))
      case other => other
    }
    def rel(r: Relation): Relation = r match {
      case Rel(c, op, v) => Rel(c, op, lit(v))
      case In(c, vs) => In(c, vs.map(lit))
      case TokenRel(cs, op, v) => TokenRel(cs, op, lit(v))
      case Contains(c, v, k) => Contains(c, lit(v), k)
      case MultiColRel(cs, op, vs) => MultiColRel(cs, op, vs.map(lit))
      case MapEntryEq(c, k, v) => MapEntryEq(c, lit(k), lit(v))
      case other => other
    }
    stmt match {
      case i: Insert => i.copy(values = i.values.map(lit))
      case u: Update => u.copy(assignments = u.assignments.map(a => a._1 -> lit(a._2)),
        where = u.where.map(rel),
        condition = u.condition.map(bindCond(_, lit)))
      case d: Delete => d.copy(where = d.where.map(rel),
        condition = d.condition.map(bindCond(_, lit)))
      case sel: Select =>
        def selExpr(e: SelExpr): SelExpr = e match {
          case LitRef(l) => LitRef(lit(l))
          case FnCall(f, args) => FnCall(f, args.map(selExpr))
          case CastCall(x, t) => CastCall(selExpr(x), t)
          case Arith(op, l, r) => Arith(op, selExpr(l), selExpr(r))
          case Neg(x) => Neg(selExpr(x))
          case CollectionCtor(k, items) => CollectionCtor(k, items.map(selExpr))
          case MapCtor(ps) => MapCtor(ps.map { case (k, v) => (selExpr(k), selExpr(v)) })
          case ElementRef(c, k) => ElementRef(c, lit(k))
          case SliceRef(c, a, b) => SliceRef(c, a.map(lit), b.map(lit))
          case other => other
        }
        sel.copy(
          selectors = sel.selectors.map {
            case ExprSel(e, a) => ExprSel(selExpr(e), a)
            case s => s
          },
          where = sel.where.map(rel),
          groupBy = sel.groupBy.map(g => g.copy(
            floorDur = g.floorDur.map(lit), floorStart = g.floorStart.map(lit))),
          perPartitionLimit = sel.perPartitionLimit.map(lit),
          limit = sel.limit.map(lit))
      case other => other
    }
  }

  private def bindCond(c: LwtCondition, lit: Literal => Literal): LwtCondition = c match {
    case IfColumns(conds) => IfColumns(conds.map { case (lhs, op, vs) =>
      val boundLhs = lhs match {
        case CondElem(n, k) => CondElem(n, lit(k))
        case other => other
      }
      (boundLhs, op, vs.map(lit))
    })
    case other => other
  }
}
