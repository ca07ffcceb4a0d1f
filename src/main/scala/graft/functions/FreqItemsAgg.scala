package graft.functions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String

/** `freq_items_agg(term, k)` — a Misra-Gries frequent-items summary
  * (Misra & Gries 1982; merge rule from Agarwal et al. 2012, "Mergeable
  * Summaries"): at most `k` counters, each update either increments a
  * held counter, claims a free one, or decrements all. Merging sums the
  * two counter sets and subtracts the (k+1)-th largest count.
  *
  * Guarantee: every item with true frequency > n/(k+1) holds a counter in
  * the final summary, under ANY partitioning/merge tree — so the eval'd
  * candidate array (sorted, deduplicated) is a SUPERSET of the items
  * above that threshold. Estimated counts are order-dependent lower
  * bounds, so they are NOT exposed; callers verify candidates with an
  * exact filtered count (see `TextAnalysis.heavyHitters`) and the final
  * output is deterministic even though the sketch is not.
  *
  * This is the 100 TB path for vocabulary analytics: the full n-gram
  * aggregation keys on the corpus vocabulary (~10^10 at web scale), while
  * this buffer is O(k) per task and the exact verify pass aggregates only
  * the candidate set.
  */
case class FreqItemsAgg(term: Expression, k: Int,
                        override val mutableAggBufferOffset: Int = 0,
                        override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, s"freq_items_agg requires k > 0, got $k")

  override def children: Seq[Expression] = Seq(term)

  override def checkInputDataTypes(): TypeCheckResult = term.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"freq_items_agg requires a string term, got $other")
  }

  override def dataType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "freq_items_agg"

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = term.eval(input)
    if (v != null) {
      val s = v.toString
      buf.get(s) match {
        case Some(c) => buf.update(s, c + 1)
        case None if buf.size < k => buf.update(s, 1L)
        case None =>
          // decrement-all; amortized O(1) per update (each pass burns k+1
          // units of total mass, and mass only enters one unit at a time)
          val dead = mutable.ArrayBuffer.empty[String]
          buf.mapValuesInPlace((_, c) => c - 1)
          buf.foreach { case (key, c) => if (c <= 0) dead += key }
          dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long],
                     b: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    b.foreach { case (s, c) => a.update(s, a.getOrElse(s, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest count, drop non-positives — the
      // mergeable-summaries rule that preserves the n/(k+1) guarantee
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[String]
      a.mapValuesInPlace((_, c) => c - cut)
      a.foreach { case (key, c) => if (c <= 0) dead += key }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keys.toArray.sorted.map(UTF8String.fromString(_): AnyRef))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val entries = buf.toArray.map { case (s, c) =>
      (s.getBytes(StandardCharsets.UTF_8), c)
    }
    val bb = ByteBuffer.allocate(4 + entries.map(_._1.length + 12).sum)
    bb.putInt(entries.length)
    entries.foreach { case (bytes, c) =>
      bb.putInt(bytes.length); bb.put(bytes); bb.putLong(c)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val sb = new Array[Byte](len)
      bb.get(sb)
      m.update(new String(sb, StandardCharsets.UTF_8), bb.getLong)
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(offset: Int): FreqItemsAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): FreqItemsAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): FreqItemsAgg =
    copy(term = cs(0))
}
