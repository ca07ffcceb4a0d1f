package graft.cql

/** AST for the CQL subset (reference grammar `src/antlr/Parser.g:207-249`;
  * semantics cited per-node). Hand-rolled parser in [[CqlParser]] — the
  * statement surface is small enough that a recursive-descent parser stays
  * readable and dependency-free.
  */
object Ast {

  /** One case per reference marshal class (`db/marshal/<Type>Type.java`). */
  sealed trait CqlType { def name: String }
  case object CqlInt extends CqlType { val name = "int" }
  case object CqlBigint extends CqlType { val name = "bigint" }
  case object CqlSmallint extends CqlType { val name = "smallint" }
  case object CqlTinyint extends CqlType { val name = "tinyint" }
  case object CqlText extends CqlType { val name = "text" }
  /** ascii = text restricted to 7-bit characters (AsciiType.validate). */
  case object CqlAscii extends CqlType { val name = "ascii" }
  case object CqlDouble extends CqlType { val name = "double" }
  case object CqlFloat extends CqlType { val name = "float" }
  case object CqlBoolean extends CqlType { val name = "boolean" }
  /** arbitrary-precision decimal/varint (DecimalType/IntegerType.java),
    * carried as Spark decimal(38,18)/(38,0).
    */
  case object CqlDecimal extends CqlType { val name = "decimal" }
  case object CqlVarint extends CqlType { val name = "varint" }
  /** millis-precision epoch timestamp (TimestampType.java). */
  case object CqlTimestamp extends CqlType { val name = "timestamp" }
  /** day-precision date (SimpleDateType.java). */
  case object CqlDate extends CqlType { val name = "date" }
  /** nanos-of-day, carried as bigint (TimeType.java). */
  case object CqlTime extends CqlType { val name = "time" }
  /** uuid/timeuuid carried in canonical lowercase string form; timeuuid
    * comparisons go through the embedded-time sort key (TimeUUIDType.java).
    */
  case object CqlUuid extends CqlType { val name = "uuid" }
  case object CqlTimeuuid extends CqlType { val name = "timeuuid" }
  case object CqlBlob extends CqlType { val name = "blob" }
  /** (months, days, nanos) duration triple (DurationType.java,
    * cql3/Duration.java:72-94) — not comparable, never in a PK; carried as
    * a Spark struct, converted to a calendar interval for ts arithmetic
    * (nanos narrow to micros there).
    */
  case object CqlDuration extends CqlType { val name = "duration" }
  case object CqlInet extends CqlType { val name = "inet" }
  /** Counter column (db/marshal/CounterColumnType.java): reads are sums of
    * update deltas; only `c = c + n` / `c = c - n` writes are legal.
    */
  case object CqlCounter extends CqlType { val name = "counter" }
  /** Collections — multi-cell semantics: element-level ops (append/prepend/
    * add/remove/put/delkey, `cql3/Lists.java:379-600`) fold in timestamp
    * order at read time; `frozen<>` collapses to the same storage here.
    */
  final case class CqlList(elem: CqlType) extends CqlType { def name = s"list<${elem.name}>" }
  final case class CqlSet(elem: CqlType) extends CqlType { def name = s"set<${elem.name}>" }
  final case class CqlMap(key: CqlType, value: CqlType) extends CqlType { def name = s"map<${key.name}, ${value.name}>" }
  /** anonymous tuple (db/marshal/TupleType.java) — frozen, lexicographic
    * compare; carried as a Spark struct with positional field names.
    */
  final case class CqlTuple(elems: Seq[CqlType]) extends CqlType {
    def name = s"tuple<${elems.map(_.name).mkString(", ")}>"
  }
  /** user-defined type (db/marshal/UserType.java; CREATE TYPE) — frozen,
    * carried as a Spark struct with the declared field names.
    */
  final case class CqlUdt(typeName: String, fields: Seq[(String, CqlType)]) extends CqlType {
    def name: String = typeName
  }

  sealed trait ColumnKind
  case object PartitionKey extends ColumnKind
  case object Clustering extends ColumnKind
  case object Static extends ColumnKind
  case object Regular extends ColumnKind

  final case class ColumnDef(name: String, tpe: CqlType, kind: ColumnKind)

  /** Table metadata (reference `schema/TableMetadata.java`): partition key
    * columns, clustering columns with per-column reversal, statics, regulars.
    */
  final case class TableDef(name: String, columns: Seq[ColumnDef],
                            clusteringDesc: Seq[Boolean],
                            defaultTtl: Long = 0L,
                            dropped: Seq[String] = Nil,
                            gcGraceSeconds: Long = 864000L) {
    val partitionKey: Seq[ColumnDef] = columns.filter(_.kind == PartitionKey)
    val clustering: Seq[ColumnDef] = columns.filter(_.kind == Clustering)
    val statics: Seq[ColumnDef] = columns.filter(_.kind == Static)
    val regulars: Seq[ColumnDef] = columns.filter(_.kind == Regular)
    val primaryKey: Seq[ColumnDef] = partitionKey ++ clustering
    /** The reference's SELECT * order (TableMetadata column comparator):
      * partition key, clustering, then remaining columns BY NAME — not
      * declaration order.
      */
    val cqlOrder: Seq[ColumnDef] = primaryKey ++ (statics ++ regulars).sortBy(_.name)
    def column(n: String): Option[ColumnDef] = columns.find(_.name == n)
  }

  sealed trait Literal { def value: Any }
  final case class IntLit(value: Long) extends Literal
  final case class DoubleLit(value: Double) extends Literal
  final case class StringLit(value: String) extends Literal
  final case class BoolLit(value: Boolean) extends Literal
  /** unquoted uuid literal token (Parser.g uuid rule). */
  final case class UuidLit(value: String) extends Literal
  /** 0x... hex blob literal (Parser.g HEXNUMBER). */
  final case class BlobLit(bytes: Array[Byte]) extends Literal { def value: Any = bytes }
  /** duration literal 1y2mo3d4h5m6s (Parser.g durationUnit). */
  final case class DurationLit(months: Int, days: Int, nanos: Long) extends Literal {
    def value: Any = s"${months}mo${days}d${nanos}ns"
  }
  case object NullLit extends Literal { val value: Any = null }
  /** positional bind marker `?` (Parser.g:41-74; bound at EXECUTE time) */
  final case class BindMarker(index: Int) extends Literal {
    def value: Any = throw new IllegalStateException(s"unbound marker $index")
  }
  /** constant function call as a term — now(), mintimeuuid('...'), uuid()
    * (Parser.g function term; evaluated once per statement by the engine).
    */
  final case class FnLit(fn: String, args: Seq[Literal]) extends Literal {
    def value: Any = s"$fn(${args.mkString(", ")})"
  }
  final case class ListLit(items: Seq[Literal]) extends Literal { def value: Any = items.map(_.value) }
  /** counter increment/decrement in UPDATE SET c = c +/- n */
  final case class CounterDeltaLit(delta: Long) extends Literal { def value: Any = delta }
  /** multi-cell collection op in UPDATE SET: op ∈ set/append/prepend/add/
    * remove/put/delkey (cql3/Lists.java, Sets.java, Maps.java).
    */
  final case class CollectionOpLit(op: String, payload: Literal) extends Literal {
    def value: Any = payload.value
  }
  final case class SetLit(items: Seq[Literal]) extends Literal { def value: Any = items.map(_.value) }
  final case class MapLit(pairs: Seq[(Literal, Literal)]) extends Literal {
    def value: Any = pairs.map { case (k, v) => k.value -> v.value }
  }
  /** (v1, v2, ...) tuple literal (Parser.g tupleLiteral). */
  final case class TupleLit(items: Seq[Literal]) extends Literal { def value: Any = items.map(_.value) }
  /** {field: v, ...} UDT literal (Parser.g usertypeLiteral). */
  final case class UdtLit(fields: Seq[(String, Literal)]) extends Literal {
    def value: Any = fields.map { case (f, v) => f -> v.value }
  }

  sealed trait Relation
  /** col op literal; op in = < <= > >= != */
  final case class Rel(column: String, op: String, value: Literal) extends Relation
  final case class In(column: String, values: Seq[Literal]) extends Relation
  /** multi-column tuple relation `(c1, c2) >= (v1, v2)`
    * (cql3/MultiColumnRelation.java): lexicographic over a clustering prefix.
    */
  final case class MultiColRel(columns: Seq[String], op: String,
                               values: Seq[Literal]) extends Relation
  /** map-entry equality `m[k] = v` (db/filter/RowFilter.java:725-817). */
  final case class MapEntryEq(column: String, key: Literal, value: Literal) extends Relation
  /** token(pk...) op literal (cql3/TokenRelation.java) */
  final case class TokenRel(columns: Seq[String], op: String, value: Literal) extends Relation
  /** CONTAINS / CONTAINS KEY (cql3/Operator.java:117-161) */
  final case class Contains(column: String, value: Literal, isKey: Boolean) extends Relation
  /** LIKE 'x%'/'%x'/'%x%'/'x' — SASI semantics (index/sasi/plan/Expression.java:50-160) */
  final case class Like(column: String, pattern: String) extends Relation
  /** IS NOT NULL — materialized-view WHERE only (Parser.g:1644). */
  final case class IsNotNull(column: String) extends Relation

  /** Selection expression tree (reference `cql3/selection/Selectable.java`:
    * columns, function calls, casts, arithmetic and element selection
    * compose; grammar `Parser.g:315-348` unaliasedSelector).
    */
  sealed trait SelExpr
  final case class ColRef(name: String) extends SelExpr
  final case class LitRef(lit: Literal) extends SelExpr
  /** `*` as a function argument — only legal in count(*). */
  case object StarRef extends SelExpr
  /** fn(args...) — scalar (TimeFcts, OperationFcts, casts) or aggregate
    * (AggregateFcts); writetime/ttl/token are resolved by the engine.
    */
  final case class FnCall(name: String, args: Seq[SelExpr]) extends SelExpr
  /** cast(x AS t) (CastFcts.java) */
  final case class CastCall(e: SelExpr, to: CqlType) extends SelExpr
  /** binary arithmetic + - * / % (OperationFcts.java:36-185) */
  final case class Arith(op: String, l: SelExpr, r: SelExpr) extends SelExpr
  /** unary minus (OperationFcts negation) */
  final case class Neg(e: SelExpr) extends SelExpr
  /** map/set element selection c[k] (cql3/selection/ElementsSelector.java) */
  final case class ElementRef(name: String, key: Literal) extends SelExpr
  /** UDT field selection u.f (cql3/selection/FieldSelector.java) */
  final case class FieldRef(column: String, field: String) extends SelExpr
  /** map/set slice selection c[a..b] with optional open ends
    * (cql3/selection/ElementsSelector.java:40-325).
    */
  final case class SliceRef(name: String, from: Option[Literal],
                            to: Option[Literal]) extends SelExpr
  /** collection/tuple constructors in selection (Parser.g:361-403;
    * ListSelector/SetSelector/MapSelector/TupleSelector.java). kind ∈
    * list/set/tuple for Ctor; maps get their own node.
    */
  final case class CollectionCtor(kind: String, items: Seq[SelExpr]) extends SelExpr
  final case class MapCtor(pairs: Seq[(SelExpr, SelExpr)]) extends SelExpr

  sealed trait Selector
  case object Star extends Selector
  final case class ExprSel(expr: SelExpr, alias: Option[String]) extends Selector

  sealed trait Statement
  final case class CreateTable(table: TableDef, ifNotExists: Boolean) extends Statement
  /** CREATE TYPE name (f1 t1, ...) (Parser.g:894-918, UserType.java). */
  final case class CreateType(udt: CqlUdt, ifNotExists: Boolean) extends Statement

  /** ALTER TYPE name ADD f t | RENAME f TO g [AND ...] | ALTER f TYPE t
    * (Parser.g:975-985; statements/schema/AlterTypeStatement.java). ALTER
    * field is parsed but rejected like the reference (:165-175).
    */
  final case class AlterType(name: String, add: Option[(String, CqlType)],
                             renames: Seq[(String, String)] = Nil,
                             alterField: Boolean = false) extends Statement

  /** CREATE FUNCTION (Parser.g:652-685, UDFunction.java). The reference
    * compiles Java/JS bodies; this engine accepts LANGUAGE spark — the body
    * is a Spark SQL expression over the named arguments (registered as a
    * Spark SQL UDF, so it inlines into codegen instead of interpreting).
    */
  /** `sparkBody` carries the Spark SQL the body lowered to (identical to
    * `body` for LANGUAGE spark; the shim's translation for LANGUAGE java) —
    * kept separate so introspection (system_schema.functions) returns the
    * language and source the client created, as the reference does.
    */
  final case class CreateFunction(name: String, args: Seq[(String, CqlType)],
                                  returnsNullOnNull: Boolean, returns: CqlType,
                                  language: String, body: String,
                                  orReplace: Boolean, ifNotExists: Boolean,
                                  sparkBody: Option[String] = None) extends Statement {
    /** The executable Spark SQL expression for this function's body. */
    def exprBody: String = sparkBody.getOrElse(body)
  }

  /** CREATE AGGREGATE (Parser.g:686-727, UDAggregate.java:44-120):
    * fold = SFUNC(state, arg1, ..., argN) per row in clustering order,
    * INITCOND seed, optional FINALFUNC. Multi-argument aggregates fold all
    * argument columns of the row through one SFUNC call
    * (CreateAggregateStatement.java:110-115 — state-function arguments are
    * the state type prepended to the argument list).
    */
  final case class CreateAggregate(name: String, argTypes: Seq[CqlType], sfunc: String,
                                   stype: CqlType, finalFunc: Option[String],
                                   initCond: Option[Literal],
                                   orReplace: Boolean, ifNotExists: Boolean) extends Statement

  /** CREATE MATERIALIZED VIEW v AS SELECT ... FROM base WHERE ... PRIMARY
    * KEY (...) (Parser.g:858-893; maintenance semantics per
    * `db/view/ViewUpdateGenerator.java` — here views derive from the base
    * reconcile at read time, so base mutations/deletes reflect immediately).
    */
  final case class CreateView(name: String, baseTable: String,
                              selectors: Seq[Selector], where: Seq[Relation],
                              partitionKey: Seq[String], clustering: Seq[String],
                              clusteringDesc: Seq[Boolean],
                              ifNotExists: Boolean) extends Statement
  final case class DropView(name: String) extends Statement
  final case class DropTable(name: String) extends Statement
  /** DROP TYPE [IF EXISTS] name (Parser.g:233-249 st27;
    * statements/schema/DropTypeStatement.java — refused while the type is
    * still referenced by functions, other types, or tables).
    */
  final case class DropType(name: String, ifExists: Boolean) extends Statement
  /** DROP FUNCTION / DROP AGGREGATE with an optional explicit
    * argument-type signature (DropFunctionStatement.java /
    * DropAggregateStatement.java; the reference disambiguates overloads
    * with it — here a mismatched signature is simply "doesn't exist").
    */
  final case class DropFunction(name: String, argTypes: Option[Seq[CqlType]],
                                ifExists: Boolean) extends Statement
  final case class DropAggregate(name: String, argTypes: Option[Seq[CqlType]],
                                 ifExists: Boolean) extends Statement
  /** ALTER MATERIALIZED VIEW v WITH opt = val [AND ...]
    * (AlterViewStatement.java — gc_grace_seconds=0 and any
    * default_time_to_live are rejected; other params are stored).
    */
  final case class AlterView(name: String, options: Seq[(String, Literal)]) extends Statement

  /** Keyspace DDL (Parser.g createKeyspaceStatement / useStatement;
    * replication/durable_writes options are distribution plumbing — parsed
    * and ignored).
    */
  final case class CreateKeyspace(name: String, ifNotExists: Boolean) extends Statement
  final case class DropKeyspace(name: String, ifExists: Boolean) extends Statement
  final case class AlterKeyspace(name: String) extends Statement
  final case class UseKeyspace(name: String) extends Statement
  /** ALTER TABLE t ADD c type [, ...] | DROP c [, ...] | RENAME a TO b |
    * WITH option = v (Parser.g alterTableStatement;
    * schema/AlterTableStatement.java).
    */
  final case class AlterTable(name: String, add: Seq[(String, CqlType)],
                              drop: Seq[String],
                              renames: Seq[(String, String)] = Nil,
                              withDttl: Option[Long] = None,
                              withGc: Option[Long] = None) extends Statement
  final case class Truncate(name: String) extends Statement

  /** INSERT: full-row upsert, sets primary-key liveness
    * (`cql3/statements/UpdateStatement.java`; INSERT-vs-UPDATE liveness
    * distinction per `db/LivenessInfo.java`).
    */
  final case class Insert(table: String, columns: Seq[String], values: Seq[Literal],
                          ttl: Option[Long], timestamp: Option[Long],
                          ifNotExists: Boolean = false) extends Statement

  /** INSERT INTO t JSON '...' (cql3/Json.java; Parser.g insertStatement) */
  final case class InsertJson(table: String, json: String, defaultUnset: Boolean,
                              ttl: Option[Long],
                              timestamp: Option[Long]) extends Statement

  /** UPDATE: per-cell upsert, NO row liveness. */
  final case class Update(table: String, assignments: Seq[(String, Literal)],
                          where: Seq[Relation], ttl: Option[Long],
                          timestamp: Option[Long],
                          condition: Option[LwtCondition] = None) extends Statement

  /** LWT condition (Parser.g:1596-1609, cql3/conditions/ColumnCondition.java). */
  sealed trait LwtCondition
  case object IfExists extends LwtCondition
  case object IfNotExists extends LwtCondition

  /** LHS of one LWT column condition: a plain column, a collection element
    * (`m['k']`, `l[0]`), or a UDT field (`u.f`) — Parser.g columnCondition.
    */
  sealed trait CondLhs { def column: String }
  final case class CondCol(column: String) extends CondLhs
  final case class CondElem(column: String, key: Literal) extends CondLhs
  final case class CondField(column: String, field: String) extends CondLhs

  /** Conditions as (lhs, op, values): ops `= != < <= > >=` carry one value,
    * `in` carries the whole list (ColumnCondition.Bound.appliesTo).
    */
  final case class IfColumns(conds: Seq[(CondLhs, String, Seq[Literal])]) extends LwtCondition

  /** LOGGED/UNLOGGED batch (cql3/statements/BatchStatement.java:58-60):
    * mutations applied atomically with a shared default timestamp.
    */
  final case class Batch(statements: Seq[Statement]) extends Statement

  /** One CREATE INDEX target (Parser.g:843-849 indexIdent): a bare column
    * (simple) or keys(c)/values(c)/entries(c)/full(c) on a collection.
    * `kind` ∈ simple|keys|values|entries|full; a simple target on a
    * collection column is corrected to values at CREATE time
    * (IndexTarget.Raw.prepare, statements/schema/IndexTarget.java:81-91).
    */
  final case class IndexTargetAst(column: String, kind: String)

  /** CREATE [CUSTOM] INDEX (Parser.g:826-841; statements/schema/
    * CreateIndexStatement.java): registers a secondary index — restrictions
    * it serves (EQ, map-entry EQ, CONTAINS [KEY], LIKE for custom/SASI) no
    * longer require ALLOW FILTERING (index/internal/
    * CassandraIndexSearcher.java, index/sasi/SASIIndex.java).
    */
  final case class CreateIndex(table: String, targets: Seq[IndexTargetAst],
                               indexName: Option[String] = None,
                               ifNotExists: Boolean = false,
                               custom: Boolean = false,
                               usingClass: Option[String] = None,
                               options: Map[String, String] = Map.empty) extends Statement

  /** DROP INDEX [IF EXISTS] name (Parser.g:1014-1018). */
  final case class DropIndex(indexName: String, ifExists: Boolean) extends Statement

  /** DELETE: row tombstone (no columns) or cell tombstones (with columns). */
  final case class Delete(table: String, columns: Seq[String], where: Seq[Relation],
                          timestamp: Option[Long],
                          condition: Option[LwtCondition] = None) extends Statement

  /** One GROUP BY element: a bare PK column, or `floor(col, duration[, start])`
    * time-bucketing (Cassandra 4.1 CASSANDRA-11871 forward-port; the
    * reference snapshot predates it). Only the LAST element may carry floor.
    */
  final case class GroupByEl(column: String,
                             floorDur: Option[Literal] = None,
                             floorStart: Option[Literal] = None)

  final case class Select(table: String, selectors: Seq[Selector], distinct: Boolean,
                          where: Seq[Relation], groupBy: Seq[GroupByEl],
                          orderBy: Seq[(String, Boolean)], // (col, desc?)
                          perPartitionLimit: Option[Literal], limit: Option[Literal],
                          allowFiltering: Boolean, json: Boolean) extends Statement
}
