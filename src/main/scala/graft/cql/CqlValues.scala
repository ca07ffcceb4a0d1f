package graft.cql

import graft.cql.Ast._
import graft.functions.TimeUuid

/** Literal parsing, validation and type-faithful value ordering for the CQL
  * type system (reference `db/marshal/<Type>Type.java`, one class per type;
  * string-literal formats per `serializers/TimestampSerializer.java`,
  * `SimpleDateSerializer.java`, `TimeSerializer.java`,
  * `InetAddressSerializer.java`).
  *
  * Every comparator here reproduces the reference type's comparison order —
  * numerics numerically, timeuuid by embedded time then unsigned bytes
  * (`TimeUUIDType.java`), blob by unsigned lexicographic bytes
  * (`BytesType.java`) — NOT a string surrogate.
  */
object CqlValues {

  final case class ValueException(msg: String) extends RuntimeException(msg)

  // ── timestamp: 'yyyy-mm-dd[ HH:mm[:ss[.fff]]][ zone]' → epoch millis ──
  // (TimestampSerializer.dateStringPatterns; default zone UTC for
  // deterministic cross-engine results — GraftSession pins UTC too)
  private val TsRe =
    """^(\d{4})-(\d{2})-(\d{2})(?:[ tT](\d{1,2}):(\d{2})(?::(\d{2}))?(?:\.(\d{1,3}))?)?\s*([zZ]|UTC|[+-]\d{2}:?\d{2})?$""".r

  def parseTimestampMillis(s: String): Long = s.trim match {
    case TsRe(y, mo, d, h, mi, se, fr, zone) =>
      val date = java.time.LocalDate.of(y.toInt, mo.toInt, d.toInt)
      val time = java.time.LocalTime.of(
        Option(h).map(_.toInt).getOrElse(0), Option(mi).map(_.toInt).getOrElse(0),
        Option(se).map(_.toInt).getOrElse(0),
        Option(fr).map(f => f.padTo(3, '0').toInt * 1000000).getOrElse(0))
      val offset = Option(zone).filterNot(z => z.equalsIgnoreCase("z") || z == "UTC")
        .map(z => java.time.ZoneOffset.of(if (z.contains(":")) z else z.take(3) + ":" + z.drop(3)))
        .getOrElse(java.time.ZoneOffset.UTC)
      java.time.LocalDateTime.of(date, time).toInstant(offset).toEpochMilli
    case other => throw ValueException(s"Unable to coerce '$other' to a formatted date (long)")
  }

  def timestampOf(ms: Long): java.sql.Timestamp = new java.sql.Timestamp(ms)

  // ── date: 'yyyy-mm-dd' (SimpleDateSerializer) ─────────────────────────
  def parseDate(s: String): java.sql.Date =
    try java.sql.Date.valueOf(java.time.LocalDate.parse(s.trim))
    catch { case _: java.time.format.DateTimeParseException =>
      throw ValueException(s"Unable to coerce '$s' to a formatted date (int)") }

  // ── time: 'HH:mm:ss[.fffffffff]' → nanos of day (TimeSerializer) ──────
  private val TimeRe = """^(\d{1,2}):(\d{2}):(\d{2})(?:\.(\d{1,9}))?$""".r

  def parseTimeNanos(s: String): Long = s.trim match {
    case TimeRe(h, m, se, fr) =>
      val nanos = Option(fr).map(_.padTo(9, '0').toLong).getOrElse(0L)
      if (h.toInt > 23) throw ValueException(s"Hour out of bounds: ${h.toInt}")
      ((h.toLong * 60 + m.toLong) * 60 + se.toLong) * 1000000000L + nanos
    case other => throw ValueException(s"Unable to coerce '$other' to a time")
  }

  // ── uuid / timeuuid ──────────────────────────────────────────────────
  private val UuidRe =
    "^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$".r

  def parseUuid(s: String): String = {
    if (UuidRe.findFirstIn(s).isEmpty)
      throw ValueException(s"Unable to make UUID from '$s'")
    s.toLowerCase
  }

  /** TimeUUIDType requires a version-1 (time-based) uuid. */
  def parseTimeUuid(s: String): String = {
    val u = parseUuid(s)
    if (java.util.UUID.fromString(u).version() != 1)
      throw ValueException(s"Invalid version for TimeUUID type: '$s'")
    u
  }

  // ── blob: 0x hex (BytesType.fromString) ───────────────────────────────
  def parseBlob(hex: String): Array[Byte] = {
    val h = if (hex.startsWith("0x") || hex.startsWith("0X")) hex.drop(2) else hex
    if (h.length % 2 != 0 || !h.forall(c => Character.digit(c, 16) >= 0))
      throw ValueException(s"cannot parse '$hex' as hex bytes")
    h.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
  }

  def blobHex(b: Array[Byte]): String = "0x" + b.map("%02x".format(_)).mkString

  // ── duration: 1y2mo3d4h5m6s7ms8us9ns (cql3/Duration.java:72-94) ───────
  private val DurUnitRe = "(\\d+)(y|mo|w|d|h|ms|us|ns|m|s)".r
  private val DurAllRe = "^(\\d+(y|mo|w|d|h|ms|us|ns|m|s))+$"

  /** (months, days, nanos) of a duration string, None if not one. */
  def parseDuration(s: String): Option[(Int, Int, Long)] = {
    if (!s.matches(DurAllRe)) None
    else {
      var months = 0; var days = 0; var nanos = 0L
      DurUnitRe.findAllMatchIn(s).foreach { m =>
        val n = m.group(1).toLong
        m.group(2) match {
          case "y" => months += (n * 12).toInt
          case "mo" => months += n.toInt
          case "w" => days += (n * 7).toInt
          case "d" => days += n.toInt
          case "h" => nanos += n * 3600000000000L
          case "m" => nanos += n * 60000000000L
          case "s" => nanos += n * 1000000000L
          case "ms" => nanos += n * 1000000L
          case "us" => nanos += n * 1000L
          case "ns" => nanos += n
        }
      }
      Some((months, days, nanos))
    }
  }

  // ── inet: IPv4/IPv6 literal, stored normalized-lowercase ──────────────
  private val Ipv4Re = """^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$""".r
  private val Ipv6Re = """^[0-9a-fA-F:]{2,39}$""".r

  def parseInet(s: String): String = s.trim match {
    case Ipv4Re(a, b, c, d) if Seq(a, b, c, d).forall(_.toInt <= 255) => s.trim
    case v if Ipv6Re.findFirstIn(v).isDefined && v.contains(":") => v.toLowerCase
    case other => throw ValueException(s"Unable to make inet address from '$other'")
  }

  def validateAscii(s: String, col: String): String = {
    if (!s.forall(_ < 128))
      throw ValueException(s"Invalid ASCII character in string literal for column $col")
    s
  }

  // ── type-faithful element ordering (set/map comparator order) ─────────
  /** The comparator of each CQL type, as used for set-element and map-key
    * storage order (`SetType`/`MapType` element comparators) and clustering
    * comparison. Numerics order numerically (NOT by toString).
    */
  def elemOrdering(t: CqlType): Ordering[Any] = t match {
    case CqlInt => Ordering.by((v: Any) => v.asInstanceOf[Int])
    case CqlBigint | CqlTime | CqlCounter => Ordering.by((v: Any) => v.asInstanceOf[Long])
    case CqlSmallint => Ordering.by((v: Any) => v.asInstanceOf[Short])
    case CqlTinyint => Ordering.by((v: Any) => v.asInstanceOf[Byte])
    case CqlDouble => Ordering.by((v: Any) => v.asInstanceOf[Double])
    case CqlFloat => Ordering.by((v: Any) => v.asInstanceOf[Float])
    case CqlBoolean => Ordering.by((v: Any) => v.asInstanceOf[Boolean])
    case CqlDecimal | CqlVarint =>
      Ordering.comparatorToOrdering(
        java.util.Comparator.naturalOrder[java.math.BigDecimal]())
        .on((v: Any) => v.asInstanceOf[java.math.BigDecimal])
    case CqlTimestamp => Ordering.by((v: Any) => v.asInstanceOf[java.sql.Timestamp].getTime)
    case CqlDate => Ordering.by((v: Any) => v.asInstanceOf[java.sql.Date].getTime)
    case CqlTimeuuid =>
      new Ordering[Any] {
        def compare(a: Any, b: Any): Int = TimeUuid.compare(a.toString, b.toString)
      }
    case CqlBlob =>
      new Ordering[Any] {
        def compare(a: Any, b: Any): Int = compareBytes(
          a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
      }
    // text/ascii/uuid/inet: lexicographic (canonical-form uuid hex order ==
    // unsigned byte order within a version)
    case _ => Ordering.by((v: Any) => v.toString)
  }

  def compareBytes(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = java.lang.Integer.compare(a(i) & 0xff, b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    java.lang.Integer.compare(a.length, b.length)
  }

  /** Sorted + deduped collection elements using the type comparator
    * (duplicates collapse by comparator equality, which also handles
    * reference-equality types like blob).
    */
  def sortedSet(items: Seq[Any], t: CqlType): Seq[Any] = {
    val ord = elemOrdering(t)
    val sorted = items.sorted(ord)
    sorted.foldLeft(Vector.empty[Any]) { (acc, v) =>
      if (acc.nonEmpty && ord.compare(acc.last, v) == 0) acc else acc :+ v
    }
  }

  /** General value comparison for LWT conditions (tpe-directed, handles
    * non-Comparable blob values; `ColumnCondition.java` compares serialized
    * bytes via the column type comparator).
    */
  def compareValues(a: Any, b: Any, t: CqlType): Int = elemOrdering(t).compare(a, b)
}
