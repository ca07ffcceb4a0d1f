package graft.cql

import graft.cql.Ast._
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.json4s.jackson.Serialization

/** Durable storage for the CQL engine: parquet mutation-log segments plus a
  * JSON schema catalog (≈ the reference's commit-log segments +
  * `system_schema`). Each flush writes one immutable segment directory —
  * append-only, so the CDC stream (`streaming/MutationStream`) can tail the
  * same files; reads merge all segments with the in-memory tail.
  */
object Storage {

  private implicit val formats: Formats = DefaultFormats

  private def typeName(t: CqlType): String = t match {
    // UDTs serialize structurally so the catalog round-trips without a
    // separate type registry
    case CqlUdt(n, fields) =>
      s"udt<$n;${fields.map { case (f, ft) => s"$f ${typeName(ft)}" }.mkString(", ")}>"
    case CqlTuple(es) => s"tuple<${es.map(typeName).mkString(", ")}>"
    case CqlList(e) => s"list<${typeName(e)}>"
    case CqlSet(e) => s"set<${typeName(e)}>"
    case CqlMap(k, v) => s"map<${typeName(k)}, ${typeName(v)}>"
    case other => other.name
  }

  /** split on top-level commas (nested <> stay intact) */
  private def splitTop(body: String): Seq[String] = {
    val parts = Vector.newBuilder[String]
    var depth = 0
    val sb = new StringBuilder
    body.foreach {
      case '<' => depth += 1; sb += '<'
      case '>' => depth -= 1; sb += '>'
      case ',' if depth == 0 => parts += sb.toString.trim; sb.clear()
      case ch => sb += ch
    }
    if (sb.nonEmpty) parts += sb.toString.trim
    parts.result()
  }

  private def parseType(s: String): CqlType = {
    val trimmed = s.trim
    def inner(prefix: String): String =
      trimmed.stripPrefix(prefix + "<").stripSuffix(">")
    if (trimmed.startsWith("list<")) CqlList(parseType(inner("list")))
    else if (trimmed.startsWith("set<")) CqlSet(parseType(inner("set")))
    else if (trimmed.startsWith("tuple<"))
      CqlTuple(splitTop(inner("tuple")).map(parseType))
    else if (trimmed.startsWith("udt<")) {
      val body = inner("udt")
      val sep = body.indexOf(';')
      val fields = splitTop(body.drop(sep + 1)).map { f =>
        val sp = f.indexOf(' ')
        f.take(sp) -> parseType(f.drop(sp + 1))
      }
      CqlUdt(body.take(sep), fields)
    } else if (trimmed.startsWith("map<")) {
      val parts = splitTop(inner("map"))
      CqlMap(parseType(parts(0)), parseType(parts(1)))
    } else trimmed match {
      case "int" => CqlInt
      case "bigint" => CqlBigint
      case "smallint" => CqlSmallint
      case "tinyint" => CqlTinyint
      case "text" => CqlText
      case "ascii" => CqlAscii
      case "double" => CqlDouble
      case "float" => CqlFloat
      case "boolean" => CqlBoolean
      case "decimal" => CqlDecimal
      case "varint" => CqlVarint
      case "timestamp" => CqlTimestamp
      case "date" => CqlDate
      case "time" => CqlTime
      case "uuid" => CqlUuid
      case "timeuuid" => CqlTimeuuid
      case "blob" => CqlBlob
      case "inet" => CqlInet
      case "duration" => CqlDuration
      case "counter" => CqlCounter
      case other => throw new IllegalArgumentException(s"unknown stored type $other")
    }
  }

  private def kindName(k: ColumnKind): String = k match {
    case PartitionKey => "partition_key"
    case Clustering => "clustering"
    case Static => "static"
    case Regular => "regular"
  }

  private def parseKind(s: String): ColumnKind = s match {
    case "partition_key" => PartitionKey
    case "clustering" => Clustering
    case "static" => Static
    case "regular" => Regular
  }

  def tableToJson(td: TableDef): String = Serialization.write(Map(
    "name" -> td.name,
    "clustering_desc" -> td.clusteringDesc,
    "default_ttl" -> td.defaultTtl,
    "gc_grace" -> td.gcGraceSeconds,
    "dropped" -> td.dropped,
    "columns" -> td.columns.map(c => Map(
      "name" -> c.name, "type" -> typeName(c.tpe), "kind" -> kindName(c.kind)))))

  def tableFromJson(json: String): TableDef = {
    val j = JsonMethods.parse(json)
    val name = (j \ "name").extract[String]
    val desc = (j \ "clustering_desc").extract[Seq[Boolean]]
    val dttl = (j \ "default_ttl").extractOpt[Long].getOrElse(0L)
    val gcGrace = (j \ "gc_grace").extractOpt[Long].getOrElse(864000L)
    val droppedCols = (j \ "dropped").extractOpt[Seq[String]].getOrElse(Nil)
    val cols = (j \ "columns").extract[Seq[Map[String, String]]].map { m =>
      ColumnDef(m("name"), parseType(m("type")), parseKind(m("kind")))
    }
    TableDef(name, cols, desc, dttl, droppedCols, gcGrace)
  }
}
