package graft.functions

import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** `topk_rows_agg(struct, k)` — bounded per-group top-k row aggregate.
  *
  * The scale path for PER PARTITION LIMIT (reference
  * `db/filter/DataLimits.java:632-1041`): a rank window must shuffle EVERY
  * row of a partition to one reducer before discarding all but k of them;
  * this aggregate keeps only the k first-by-clustering-order rows per group
  * in the map-side partial buffer, so the shuffle carries at most
  * k rows × groups-per-map-task instead of the whole partition. On the
  * reference's wide-partition data model (thousands of clustering rows per
  * partition key, limits of 1-10) that is the difference between shuffling
  * the table and shuffling ~k rows per key.
  *
  * `sortIdx`/`desc` select the clustering-order fields INSIDE the struct
  * (by ordinal) and their per-field direction — the reference's per-column
  * `CLUSTERING ORDER BY` (`ReversedType`). Nulls sort first ascending /
  * last descending, matching Spark's default `asc`/`desc` null ordering so
  * the aggregate is interchangeable with the window form.
  *
  * Buffer rows are `UnsafeRow` copies (deep — safe against Spark's reused
  * scan buffers); the buffer stays sorted (binary-search insert) and never
  * exceeds k entries, so update is O(log k) compares + O(k) move on hit,
  * O(log k) compares on miss — and spills are k rows, not a partition.
  */
case class TopKRowsAgg(row: Expression, sortIdx: Seq[Int], desc: Seq[Boolean],
                       k: Int,
                       override val mutableAggBufferOffset: Int = 0,
                       override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[UnsafeRow]] {

  require(k > 0, "PER PARTITION LIMIT must be strictly positive")
  require(sortIdx.length == desc.length, "one direction per sort field")

  // lazy: a non-struct argument must reach checkInputDataTypes as a
  // TypeCheckFailure, not blow up as a cast during construction
  private lazy val rowType: StructType = row.dataType.asInstanceOf[StructType]

  override def children: Seq[Expression] = Seq(row)

  override def checkInputDataTypes(): TypeCheckResult = row.dataType match {
    case s: StructType if sortIdx.forall(i => i >= 0 && i < s.length) =>
      TypeCheckResult.TypeCheckSuccess
    case s: StructType => TypeCheckResult.TypeCheckFailure(
      s"sort ordinals $sortIdx out of range for ${s.length}-field struct")
    case t => TypeCheckResult.TypeCheckFailure(s"topk_rows_agg requires a struct, got $t")
  }

  override def dataType: DataType = ArrayType(rowType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "topk_rows_agg"

  @transient private lazy val project = UnsafeProjection.create(rowType)
  @transient private lazy val fieldTypes: Array[DataType] =
    sortIdx.map(i => rowType(i).dataType).toArray
  @transient private lazy val orderings: Array[Ordering[Any]] =
    fieldTypes.map(TypeUtils.getInterpretedOrdering)

  /** Clustering comparison over the selected fields, direction-aware. */
  private def compare(a: UnsafeRow, b: UnsafeRow): Int = {
    var i = 0
    while (i < sortIdx.length) {
      val idx = sortIdx(i)
      val dt = fieldTypes(i)
      val va = if (a.isNullAt(idx)) null else a.get(idx, dt)
      val vb = if (b.isNullAt(idx)) null else b.get(idx, dt)
      val c =
        if (va == null && vb == null) 0
        else if (va == null) -1 // nulls first ascending...
        else if (vb == null) 1
        else orderings(i).compare(va, vb)
      if (c != 0) return if (desc(i)) -c else c // ...last when reversed
      i += 1
    }
    0
  }

  /** Insertion point: first position whose row sorts after `r` (upper
    * bound — equal rows keep arrival order, like row_number on ties).
    */
  private def insertPos(buf: ArrayBuffer[UnsafeRow], r: UnsafeRow): Int = {
    var lo = 0
    var hi = buf.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (compare(buf(mid), r) <= 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  private def insert(buf: ArrayBuffer[UnsafeRow], r: UnsafeRow): Unit = {
    val pos = insertPos(buf, r)
    if (pos < k) {
      buf.insert(pos, r)
      if (buf.length > k) buf.remove(k)
    } // pos >= k: sorts after the kept k — drop without copying anything
  }

  override def createAggregationBuffer(): ArrayBuffer[UnsafeRow] =
    new ArrayBuffer[UnsafeRow](math.min(k, 16))

  override def update(buf: ArrayBuffer[UnsafeRow], input: InternalRow): ArrayBuffer[UnsafeRow] = {
    val v = row.eval(input)
    if (v != null) {
      val r = project(v.asInstanceOf[InternalRow])
      // cheap reject before the copy: full buffer and sorts after the last
      if (buf.length < k || compare(r, buf.last) < 0) insert(buf, r.copy())
    }
    buf
  }

  override def merge(a: ArrayBuffer[UnsafeRow], b: ArrayBuffer[UnsafeRow]): ArrayBuffer[UnsafeRow] = {
    // both sides are sorted and already ≤ k rows; b's rows are owned copies
    b.foreach { r => if (a.length < k || compare(r, a.last) < 0) insert(a, r) }
    a
  }

  override def eval(buf: ArrayBuffer[UnsafeRow]): Any =
    new GenericArrayData(buf.toArray[Any])

  override def serialize(buf: ArrayBuffer[UnsafeRow]): Array[Byte] = {
    var total = 4
    buf.foreach(r => total += 4 + r.getSizeInBytes)
    val bb = ByteBuffer.allocate(total)
    bb.putInt(buf.length)
    buf.foreach { r =>
      bb.putInt(r.getSizeInBytes)
      r.writeTo(bb)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[UnsafeRow] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new ArrayBuffer[UnsafeRow](math.max(n, 1))
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val arr = new Array[Byte](len)
      bb.get(arr)
      val r = new UnsafeRow(rowType.length)
      r.pointTo(arr, len)
      buf += r
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKRowsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKRowsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKRowsAgg =
    copy(row = cs(0))
}
