package graft.functions

import java.nio.charset.StandardCharsets

/** Bit-exact re-implementation of the reference partitioner's hash.
  *
  * Semantics (studied from the reference, re-implemented from scratch):
  *  - `dht/Murmur3Partitioner.java:214-247` — token = h1 of MurmurHash3
  *    x64/128 with seed 0, normalized so Long.MinValue maps to Long.MaxValue;
  *    an empty key yields the minimum token.
  *  - `utils/MurmurHash.java:175-253` — "almost" MurmurHash3: tail bytes are
  *    SIGN-EXTENDED when XOR'd into k1/k2 (the historical sign bug the
  *    reference must keep forever for ring compatibility). We reproduce it.
  *
  * Key serialization follows the CQL native-type wire formats:
  * bigint → 8-byte big-endian, int → 4-byte big-endian, text → UTF-8 bytes.
  */
object CassandraMurmur3 {

  @inline private def rotl64(v: Long, n: Int): Long = (v << n) | (v >>> (64 - n))

  @inline private def fmix(kIn: Long): Long = {
    var k = kIn
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  @inline private def getBlock(data: Array[Byte], offset: Int): Long =
    ((data(offset + 0) & 0xffL)) |
      ((data(offset + 1) & 0xffL) << 8) |
      ((data(offset + 2) & 0xffL) << 16) |
      ((data(offset + 3) & 0xffL) << 24) |
      ((data(offset + 4) & 0xffL) << 32) |
      ((data(offset + 5) & 0xffL) << 40) |
      ((data(offset + 6) & 0xffL) << 48) |
      ((data(offset + 7) & 0xffL) << 56)

  /** MurmurHash3 x64/128 h1 with the reference's signed-tail quirk. */
  def hash3x64128h1(data: Array[Byte], offset: Int, length: Int, seed: Long): Long = {
    val c1 = 0x87c37b91114253d5L
    val c2 = 0x4cf5ad432745937fL
    var h1 = seed
    var h2 = seed
    val nblocks = length >> 4

    var i = 0
    while (i < nblocks) {
      var k1 = getBlock(data, offset + i * 16)
      var k2 = getBlock(data, offset + i * 16 + 8)

      k1 *= c1; k1 = rotl64(k1, 31); k1 *= c2; h1 ^= k1
      h1 = rotl64(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= c2; k2 = rotl64(k2, 33); k2 *= c1; h2 ^= k2
      h2 = rotl64(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }

    // Tail: bytes are sign-extended (`(long) b << shift`, no & 0xff) — the
    // deliberate reproduction of the reference's sign bug.
    val tail = offset + nblocks * 16
    var k1 = 0L
    var k2 = 0L
    val rem = length & 15
    if (rem >= 15) k2 ^= data(tail + 14).toLong << 48
    if (rem >= 14) k2 ^= data(tail + 13).toLong << 40
    if (rem >= 13) k2 ^= data(tail + 12).toLong << 32
    if (rem >= 12) k2 ^= data(tail + 11).toLong << 24
    if (rem >= 11) k2 ^= data(tail + 10).toLong << 16
    if (rem >= 10) k2 ^= data(tail + 9).toLong << 8
    if (rem >= 9) k2 ^= data(tail + 8).toLong
    if (rem >= 9) { k2 *= c2; k2 = rotl64(k2, 33); k2 *= c1; h2 ^= k2 }
    if (rem >= 8) k1 ^= data(tail + 7).toLong << 56
    if (rem >= 7) k1 ^= data(tail + 6).toLong << 48
    if (rem >= 6) k1 ^= data(tail + 5).toLong << 40
    if (rem >= 5) k1 ^= data(tail + 4).toLong << 32
    if (rem >= 4) k1 ^= data(tail + 3).toLong << 24
    if (rem >= 3) k1 ^= data(tail + 2).toLong << 16
    if (rem >= 2) k1 ^= data(tail + 1).toLong << 8
    if (rem >= 1) { k1 ^= data(tail).toLong; k1 *= c1; k1 = rotl64(k1, 31); k1 *= c2; h1 ^= k1 }

    h1 ^= length; h2 ^= length
    h1 += h2; h2 += h1
    h1 = fmix(h1); h2 = fmix(h2)
    h1 += h2
    h1
  }

  /** Token of raw key bytes: normalized h1; empty key → minimum token. */
  def tokenOfBytes(key: Array[Byte]): Long = {
    if (key.isEmpty) return Long.MinValue
    val h1 = hash3x64128h1(key, 0, key.length, 0L)
    if (h1 == Long.MinValue) Long.MaxValue else h1
  }

  def tokenOfLong(v: Long): Long = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = (v >>> (56 - 8 * i)).toByte; i += 1 }
    tokenOfBytes(b)
  }

  def tokenOfInt(v: Int): Long = {
    val b = new Array[Byte](4)
    var i = 0
    while (i < 4) { b(i) = (v >>> (24 - 8 * i)).toByte; i += 1 }
    tokenOfBytes(b)
  }

  def tokenOfString(s: String): Long = tokenOfBytes(s.getBytes(StandardCharsets.UTF_8))

  def serializeLong(v: Long): Array[Byte] = {
    val b = new Array[Byte](8)
    var i = 0
    while (i < 8) { b(i) = (v >>> (56 - 8 * i)).toByte; i += 1 }
    b
  }

  def serializeInt(v: Int): Array[Byte] = {
    val b = new Array[Byte](4)
    var i = 0
    while (i < 4) { b(i) = (v >>> (24 - 8 * i)).toByte; i += 1 }
    b
  }

  /** Composite partition key serialization (reference
    * `db/marshal/CompositeType.java:343-370`): per component a 2-byte
    * big-endian length, the component bytes, and a 0x00 end-of-component
    * marker. The token is the murmur of the composite buffer.
    */
  def compositeBytes(parts: Seq[Array[Byte]]): Array[Byte] = {
    val total = parts.map(_.length + 3).sum
    val out = new Array[Byte](total)
    var o = 0
    parts.foreach { p =>
      out(o) = ((p.length >> 8) & 0xff).toByte
      out(o + 1) = (p.length & 0xff).toByte
      System.arraycopy(p, 0, out, o + 2, p.length)
      out(o + 2 + p.length) = 0
      o += p.length + 3
    }
    out
  }

  def tokenOfComposite(parts: Seq[Array[Byte]]): Long = tokenOfBytes(compositeBytes(parts))

  /** Plain 64-bit murmur of a string with an arbitrary seed — used as the
    * base hash for MinHash/SimHash shingles (scale path: one pass, no UDF).
    */
  def hashString(s: String, seed: Long): Long = {
    val b = s.getBytes(StandardCharsets.UTF_8)
    hash3x64128h1(b, 0, b.length, seed)
  }
}
