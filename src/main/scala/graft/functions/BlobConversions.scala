package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

/** CQL blob conversion semantics (`cql3/functions/BytesConversionFcts
  * .java:36-108`): `<type>AsBlob(x)` reinterprets a value as its CQL wire
  * bytes; `blobAs<Type>(b)` the inverse. Wire formats are big-endian
  * fixed-width for numerics, UTF-8 for text.
  */
object BlobConversions {
  def intAsBlob(v: Int): Array[Byte] = ByteBuffer.allocate(4).putInt(v).array()
  def bigintAsBlob(v: Long): Array[Byte] = ByteBuffer.allocate(8).putLong(v).array()
  def doubleAsBlob(v: Double): Array[Byte] = ByteBuffer.allocate(8).putDouble(v).array()
  def floatAsBlob(v: Float): Array[Byte] = ByteBuffer.allocate(4).putFloat(v).array()
  def booleanAsBlob(v: Boolean): Array[Byte] = Array(if (v) 1.toByte else 0.toByte)
  def textAsBlob(v: String): Array[Byte] = v.getBytes(StandardCharsets.UTF_8)

  def smallintAsBlob(v: Short): Array[Byte] = ByteBuffer.allocate(2).putShort(v).array()
  def tinyintAsBlob(v: Byte): Array[Byte] = Array(v)
  /** 16-byte uuid wire form (UUIDType serialization). */
  def uuidAsBlob(v: String): Array[Byte] = {
    val u = java.util.UUID.fromString(v)
    ByteBuffer.allocate(16).putLong(u.getMostSignificantBits)
      .putLong(u.getLeastSignificantBits).array()
  }
  /** 4-byte unsigned day count centered at 2^31 (SimpleDateType wire form);
    * input is days since unix epoch.
    */
  def dateAsBlob(days: Int): Array[Byte] =
    ByteBuffer.allocate(4).putInt(days + Int.MinValue).array()

  def blobAsInt(b: Array[Byte]): Int = ByteBuffer.wrap(b).getInt
  def blobAsBigint(b: Array[Byte]): Long = ByteBuffer.wrap(b).getLong
  def blobAsDouble(b: Array[Byte]): Double = ByteBuffer.wrap(b).getDouble
  def blobAsFloat(b: Array[Byte]): Float = ByteBuffer.wrap(b).getFloat
  def blobAsBoolean(b: Array[Byte]): Boolean = b.nonEmpty && b(0) != 0
  def blobAsText(b: Array[Byte]): String = new String(b, StandardCharsets.UTF_8)
}
