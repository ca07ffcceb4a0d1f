package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** `minhash_agg(h1, h2, numPerms)` — one-pass MinHash signature aggregate.
  *
  * Permutation j is the double-hashing combine perm_j(s) = h1(s) + j*h2(s)
  * (wrapping 64-bit); the buffer keeps the per-permutation minimum. A single
  * TypedImperativeAggregate with a primitive long[] buffer replaces a
  * 128-column min() aggregate — same result, one tight loop per row, no
  * 128-field codegen blowup, and partial aggregation (merge = elementwise
  * min) still happens map-side before the shuffle.
  */
case class MinHashAgg(h1: Expression, h2: Expression, numPerms: Int,
                      override val mutableAggBufferOffset: Int = 0,
                      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(h1, h2)

  override def checkInputDataTypes(): TypeCheckResult =
    (h1.dataType, h2.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (a, b) => TypeCheckResult.TypeCheckFailure(
        s"minhash_agg requires (bigint, bigint), got ($a, $b)")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_agg"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v1 = h1.eval(input)
    val v2 = h2.eval(input)
    if (v1 != null && v2 != null) {
      val a = v1.asInstanceOf[Long]
      val b = v2.asInstanceOf[Long]
      var j = 0
      var v = a
      while (j < numPerms) {
        if (v < buf(j)) buf(j) = v
        v += b // (a + j*b) via strength reduction; wraps like the reference's
        j += 1 //  fixed-width int semantics
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numPerms) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 8)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(offset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): MinHashAgg =
    copy(h1 = cs(0), h2 = cs(1))
}

/** `simhash_agg(h)` — one-pass 64-bit SimHash: per-bit ±1 votes in an
  * int[64] buffer, sign of each vote becomes the output bit.
  */
case class SimHashAgg(h: Expression,
                      override val mutableAggBufferOffset: Int = 0,
                      override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(h)

  override def checkInputDataTypes(): TypeCheckResult = h.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash_agg requires bigint, got $t")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash_agg"

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = h.eval(input)
    if (v != null) {
      val hv = v.asInstanceOf[Long]
      var j = 0
      while (j < 64) {
        if (((hv >>> j) & 1L) == 1L) buf(j) += 1 else buf(j) -= 1
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var j = 0
    while (j < 64) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var out = 0L
    var j = 0
    while (j < 64) { if (buf(j) >= 0) out |= (1L << j); j += 1 }
    out
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(bytes.length / 4)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(offset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): SimHashAgg =
    copy(h = cs(0))
}

/** `minhash_sig(shingles, numPerms)` — the whole MinHash signature computed
  * in ONE pass over a document's shingle array, per row, inside the scan
  * stage. Permutation convention identical to [[MinHashAgg]] fed by
  * `murmur64(s, 1)` / `murmur64(s, 2)`: perm_j(s) = h1(s) + j*h2(s),
  * wrapping 64-bit, buffer keeps per-permutation minima. min() is
  * duplicate-invariant, so feeding raw (non-distinct) shingles yields the
  * same bits as the exploded-distinct aggregate — without materializing a
  * row per shingle or paying the hash-aggregate machinery, and with no
  * shuffle at all in the signature stage.
  */
case class MinHashSig(child: Expression, numPerms: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  require(numPerms >= 1, s"minhash_sig needs >= 1 permutation, got $numPerms")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires array<string> shingles, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val buf = Array.fill(numPerms)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i).toString
        val a = CassandraMurmur3.hashString(s, 1L)
        val b = CassandraMurmur3.hashString(s, 2L)
        var j = 0
        var v = a
        while (j < numPerms) {
          if (v < buf(j)) buf(j) = v
          v += b // (a + j*b) by strength reduction, wrapping like MinHashAgg
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(buf)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `simhash_sig(shingles)` — the 64-bit SimHash computed in one row-local
  * pass, scan-fused like [[MinHashSig]]. Votes over the DISTINCT shingles
  * of the row (an internal string set — SimHash is NOT duplicate-invariant,
  * so the dedup that [[graft.operators.Dedup.explodedShingles]] performs
  * must happen here too for bit-parity with the exploded [[SimHashAgg]]
  * route) with the same `murmur64(s, 0x51c0)` base hash and >= 0 bit rule.
  */
case class SimHashSig(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(_: StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig requires array<string> shingles, got $t")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val votes = new Array[Int](64)
    val seen = new java.util.HashSet[String]()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i).toString
        if (seen.add(s)) {
          val hv = CassandraMurmur3.hashString(s, 0x51c0L)
          var j = 0
          while (j < 64) {
            if (((hv >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
            j += 1
          }
        }
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (votes(j) >= 0) out |= (1L << j); j += 1 }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}
