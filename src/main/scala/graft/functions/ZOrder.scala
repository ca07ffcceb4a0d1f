package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Z-order (Morton) curve support — the multi-dimensional clustering
  * layout (Delta `OPTIMIZE ZORDER BY`, Hudi/Iceberg z-ordering): sorting
  * by the bit-interleaving of two dimensions places rows close in BOTH
  * dimensions into the same files, so per-file min/max statistics prune
  * 2-d box predicates that a single-column sort can only prune on its
  * leading column. [[graft.operators.Layout.zorderRepartition]] is the
  * write path; LayoutSpec demonstrates the pruning win with real footer
  * statistics.
  */
object ZOrder {

  /** Interleave the low `bits` of two non-negative longs: result bit 2i
    * is a's bit i, bit 2i+1 is b's bit i — plain shift/mask arithmetic,
    * restated as the identical expression chain in the DuckDB oracle.
    */
  def interleave(a: Long, b: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((a >> i) & 1L) << (2 * i)
      z |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }
}

/** `z_value(a, b, bits)` — Morton interleaving of the low `bits` of two
  * integral columns (codegen'd; `bits` must be a foldable int in 1..31).
  * Caller normalizes dimensions to non-negative ranges first (id-like
  * columns already are; continuous dimensions bucket via ntile/floor).
  */
case class ZValue(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType | IntegerType | ShortType | ByteType,
            LongType | IntegerType | ShortType | ByteType) =>
        if (bits >= 1 && bits <= 31) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"z_value bits must be in 1..31, got $bits")
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"z_value requires integral inputs, got $l, $r")
    }

  override def dataType: DataType = LongType
  override def prettyName: String = "z_value"

  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(toLong(a), toLong(b), bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ZOrder.interleave((long)($a), (long)($b), $bits)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ZValue =
    copy(left = l, right = r)
}
