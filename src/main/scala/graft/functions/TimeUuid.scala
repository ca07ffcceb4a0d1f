package graft.functions

import java.util.UUID

/** Time-based (v1) UUID semantics matching the reference
  * (`utils/UUIDGen.java`, `cql3/functions/TimeFcts.java:39-142`,
  * `db/marshal/TimeUUIDType.java`):
  *  - UUID time is 100ns ticks since 1582-10-15 (START_EPOCH offset);
  *  - `minTimeUUID(ms)` / `maxTimeUUID(ms)` are query boundary values with
  *    fixed min/max clock-seq+node (0x8080.../0x7f7f...), maxTimeUUID taking
  *    the last 100ns tick of the millisecond;
  *  - ordering is by embedded timestamp first, then by the remaining bytes
  *    (NOT plain lexicographic UUID-string order).
  */
object TimeUuid {

  /** 1582-10-15 epoch offset in millis (UUIDGen.START_EPOCH). */
  val StartEpochMillis: Long = -12219292800000L

  private val MinClockSeqAndNode = 0x8080808080808080L
  private val MaxClockSeqAndNode = 0x7f7f7f7f7f7f7f7fL

  private def ticksFromUnixMillis(ms: Long): Long = (ms - StartEpochMillis) * 10000L

  /** First 100ns tick of a unix millisecond (for generator counters). */
  def ticksAtMillis(ms: Long): Long = ticksFromUnixMillis(ms)

  /** Fixed clock-seq/node for GENERATED (non-boundary) v1 uuids: variant bits
    * `10`, multicast bit set in the node's first octet so it cannot collide
    * with a real MAC — mirroring UUIDGen's hashed-pseudo-node approach without
    * a host identity, keeping generated values deterministic modulo ticks.
    */
  val GeneratedClockSeqAndNode: Long = 0x8000000000000000L | 0x116772616674L

  /** v1 uuid from explicit 100ns ticks + clock-seq/node (UUIDGen layout). */
  def fromTicks(ticks: Long, clockSeqAndNode: Long): String =
    new UUID(msbFromTicks(ticks), clockSeqAndNode).toString

  /** Standard v1 MSB layout from 100ns ticks. */
  private def msbFromTicks(ticks: Long): Long =
    ((ticks & 0xffffffffL) << 32) |
      (((ticks >>> 32) & 0xffffL) << 16) |
      ((ticks >>> 48) & 0x0fffL) |
      0x1000L

  def minTimeUuid(ms: Long): String =
    new UUID(msbFromTicks(ticksFromUnixMillis(ms)), MinClockSeqAndNode).toString

  def maxTimeUuid(ms: Long): String =
    new UUID(msbFromTicks(ticksFromUnixMillis(ms + 1) - 1), MaxClockSeqAndNode).toString

  /** 100ns ticks embedded in a v1 UUID. */
  def ticksOf(uuidStr: String): Long = UUID.fromString(uuidStr).timestamp()

  /** Millis-since-unix-epoch of a v1 UUID (TimeFcts dateOf/unixTimestampOf). */
  def unixMillisOf(uuidStr: String): Long = ticksOf(uuidStr) / 10000L + StartEpochMillis

  /** Reference timeuuid ordering: embedded timestamp, then unsigned bytes. */
  def compare(a: String, b: String): Int = {
    val (ua, ub) = (UUID.fromString(a), UUID.fromString(b))
    val byTime = java.lang.Long.compare(ua.timestamp(), ub.timestamp())
    if (byTime != 0) byTime
    else {
      val byMsb = java.lang.Long.compareUnsigned(ua.getMostSignificantBits, ub.getMostSignificantBits)
      if (byMsb != 0) byMsb
      else java.lang.Long.compareUnsigned(ua.getLeastSignificantBits, ub.getLeastSignificantBits)
    }
  }

  /** 24-byte sort key whose unsigned-lexicographic (Spark BinaryType) order
    * equals [[compare]]: big-endian (ticks, msb, lsb) with sign bits flipped
    * so signed longs order as unsigned.
    */
  def sortKey(uuidStr: String): Array[Byte] = {
    val u = UUID.fromString(uuidStr)
    val buf = java.nio.ByteBuffer.allocate(24)
    buf.putLong(u.timestamp() ^ Long.MinValue)
    buf.putLong(u.getMostSignificantBits ^ Long.MinValue)
    buf.putLong(u.getLeastSignificantBits ^ Long.MinValue)
    buf.array()
  }

  /** Random v4 uuid (UuidFcts.java). */
  def randomUuid(): String = UUID.randomUUID().toString
}
