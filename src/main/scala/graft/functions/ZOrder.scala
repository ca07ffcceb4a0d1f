package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types._

/** Z-order (Morton) curve support — the multi-dimensional clustering
  * layout (Delta `OPTIMIZE ZORDER BY`, Hudi/Iceberg z-ordering): sorting
  * by the bit-interleaving of N dimensions places rows close in ALL
  * dimensions into the same files, so per-file min/max statistics prune
  * N-d box predicates that a single-column sort can only prune on its
  * leading column. [[graft.operators.Layout.zorderRepartition]] is the
  * write path; LayoutSpec demonstrates the pruning win with real footer
  * statistics on 2 and 3 dimensions.
  */
object ZOrder {

  /** Scatter the low `bits` of `v` across a stride-`n` comb starting at
    * `offset`: result bit (i·n + offset) is v's bit i — the per-dimension
    * half of the interleaving, shared by eval and codegen.
    */
  def spread(v: Long, bits: Int, n: Int, offset: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((v >> i) & 1L) << (i * n + offset)
      i += 1
    }
    z
  }

  /** Interleave the low `bits` of two non-negative longs: result bit 2i
    * is a's bit i, bit 2i+1 is b's bit i — plain shift/mask arithmetic,
    * restated as the identical expression chain in the DuckDB oracle.
    * (The 2-d special case of [[spread]]; kept as the spec anchor.)
    */
  def interleave(a: Long, b: Long, bits: Int): Long =
    spread(a, bits, 2, 0) | spread(b, bits, 2, 1)
}

/** `z_value(c1, ..., cN, bits)` — Morton interleaving of the low `bits`
  * of N ≥ 2 integral columns (codegen'd; `bits` must be a foldable int
  * with bits·N ≤ 63, so the curve value fits a non-negative long).
  * Result bit (i·N + k) is dimension k's bit i — for N = 2 exactly the
  * classic a-even/b-odd layout the q_zorder oracle restates. Caller
  * normalizes dimensions to non-negative `bits`-wide ranges first
  * (id-like columns already are; continuous dimensions bucket via
  * floor-scaling — [[graft.operators.Layout.zorderRepartition]]).
  */
case class ZValueN(inputs: Seq[Expression], bits: Int) extends Expression {

  override def children: Seq[Expression] = inputs
  override def nullable: Boolean = inputs.exists(_.nullable)
  override def dataType: DataType = LongType
  override def prettyName: String = "z_value"
  override def foldable: Boolean = inputs.forall(_.foldable)

  override def checkInputDataTypes(): TypeCheckResult = {
    if (inputs.length < 2)
      return TypeCheckResult.TypeCheckFailure(
        s"z_value needs at least 2 dimensions, got ${inputs.length}")
    val bad = inputs.map(_.dataType).find {
      case LongType | IntegerType | ShortType | ByteType => false
      case _ => true
    }
    if (bad.isDefined)
      return TypeCheckResult.TypeCheckFailure(
        s"z_value requires integral inputs, got ${bad.get}")
    if (bits < 1 || bits * inputs.length > 63)
      return TypeCheckResult.TypeCheckFailure(
        s"z_value needs 1 <= bits and bits*dims <= 63, " +
          s"got bits=$bits dims=${inputs.length}")
    TypeCheckResult.TypeCheckSuccess
  }

  private def toLong(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case s: Short => s.toLong
    case b: Byte => b.toLong
  }

  override def eval(input: InternalRow): Any = {
    val n = inputs.length
    var z = 0L
    var k = 0
    while (k < n) {
      val v = inputs(k).eval(input)
      if (v == null) return null
      z |= ZOrder.spread(toLong(v), bits, n, k)
      k += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = inputs.length
    val evals = inputs.map(_.genCode(ctx))
    val inputCode = evals.map(_.code.toString).mkString("\n")
    val anyNull =
      if (nullable) evals.map(_.isNull.toString).mkString(" || ") else "false"
    val acc = evals.zipWithIndex.map { case (e, k) =>
      s"${ev.value} |= graft.functions.ZOrder.spread((long)(${e.value}), " +
        s"$bits, $n, $k);"
    }.mkString("\n")
    ev.copy(code =
      code"""
        $inputCode
        boolean ${ev.isNull} = false;
        long ${ev.value} = 0L;
        if ($anyNull) {
          ${ev.isNull} = true;
        } else {
          $acc
        }""")
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): ZValueN =
    copy(inputs = newChildren)
}
