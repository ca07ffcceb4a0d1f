package graft.cql

import java.security.MessageDigest

import graft.cql.Ast._
import org.apache.spark.sql.DataFrame

/** Prepared-statement surface (reference `QueryProcessor.java:460-490`,
  * `transport/messages/ExecuteMessage.java`): statements parse once, cache
  * by MD5 digest of the CQL string, and execute with positional bind values
  * substituted for `?` markers.
  */
final class PreparedStatements(engine: CqlEngine) {

  final case class Prepared(id: String, statement: Statement, numBinds: Int)

  private val cache = new java.util.concurrent.ConcurrentHashMap[String, Prepared]()

  private def digest(cql: String): String =
    MessageDigest.getInstance("MD5").digest(cql.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def countBinds(stmt: Statement): Int = {
    var n = 0
    def lit(l: Literal): Unit = l match {
      case BindMarker(_) => n += 1
      case ListLit(xs) => xs.foreach(lit)
      case SetLit(xs) => xs.foreach(lit)
      case MapLit(ps) => ps.foreach { case (k, v) => lit(k); lit(v) }
      case CollectionOpLit(_, pl) => lit(pl)
      case _ =>
    }
    def rel(r: Relation): Unit = r match {
      case Rel(_, _, v) => lit(v)
      case In(_, vs) => vs.foreach(lit)
      case TokenRel(_, _, v) => lit(v)
      case Contains(_, v, _) => lit(v)
      case Like(_, _) =>
    }
    stmt match {
      case i: Insert => i.values.foreach(lit)
      case u: Update => u.assignments.foreach(a => lit(a._2)); u.where.foreach(rel)
      case d: Delete => d.where.foreach(rel)
      case sel: Select => sel.where.foreach(rel)
      case _ =>
    }
    n
  }

  /** Parse + cache; returns the statement id (the reference returns the MD5
    * digest to the client the same way).
    */
  def prepare(cql: String): Prepared =
    cache.computeIfAbsent(digest(cql), id => {
      val stmt = CqlParser.parse(cql)
      Prepared(id, stmt, countBinds(stmt))
    })

  /** Execute a prepared id with positional bind values. */
  def execute(id: String, binds: Any*): DataFrame = {
    val prep = Option(cache.get(id)).getOrElse(
      throw engine.InvalidRequest(s"Prepared query with ID $id not found"))
    if (binds.length != prep.numBinds)
      throw engine.InvalidRequest(
        s"Invalid amount of bind variables: expected ${prep.numBinds}, got ${binds.length}")
    engine.run(bind(prep.statement, binds.toIndexedSeq))
  }

  private def toLiteral(v: Any): Literal = v match {
    case null => NullLit
    case i: Int => IntLit(i.toLong)
    case l: Long => IntLit(l)
    case d: Double => DoubleLit(d)
    case f: Float => DoubleLit(f.toDouble)
    case s: String => StringLit(s)
    case b: Boolean => BoolLit(b)
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
      case CollectionOpLit(op, pl) => CollectionOpLit(op, lit(pl))
      case other => other
    }
    def rel(r: Relation): Relation = r match {
      case Rel(c, op, v) => Rel(c, op, lit(v))
      case In(c, vs) => In(c, vs.map(lit))
      case TokenRel(cs, op, v) => TokenRel(cs, op, lit(v))
      case Contains(c, v, k) => Contains(c, lit(v), k)
      case other => other
    }
    stmt match {
      case i: Insert => i.copy(values = i.values.map(lit))
      case u: Update => u.copy(assignments = u.assignments.map(a => a._1 -> lit(a._2)),
        where = u.where.map(rel))
      case d: Delete => d.copy(where = d.where.map(rel))
      case sel: Select => sel.copy(where = sel.where.map(rel))
      case other => other
    }
  }
}
