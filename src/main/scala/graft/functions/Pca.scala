package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Distributed moment kernels for PCA / whitening over an embedding
  * column — the Faiss `PCAMatrix`/`OPQ` pre-transform tier: train a
  * linear projection from corpus second moments, then rotate/reduce
  * every embedding before the ANN index sees it.
  *
  * Scale shape: training needs exactly the corpus mean and Gram matrix
  * (Σx, Σxxᵀ, n) — [[GramMatrixAgg]] accumulates all three in ONE pass
  * with a primitive long[] buffer (count + d scaled sums + the
  * d(d+1)/2 scaled upper-triangular products), merged map-side like
  * any aggregate. The buffer is dim-bounded (d=1024 → ~525k longs ≈
  * 4 MB — executor-trivial, driver-bounded), never corpus-sized; the
  * eigendecomposition then runs driver-side on the d×d matrix exactly
  * like the IVF/PQ codebook trainings run on their bounded collects.
  *
  * Determinism (the house fixed-point recipe): every per-row term is
  * rounded ONCE to a 2^24 fixed-point long (`Math.round(v * 2^24)`) and
  * summed in integer arithmetic, so the accumulated moments are
  * identical under any partitioning or merge order — the property that
  * makes the trained projection oracle-checkable bit-for-bit.
  */
object Pca {

  /** Fixed-point scale for moment accumulation (2^24, the shared house
    * constant — see `Similarity.fixedPointScale`).
    */
  val Scale: Double = (1L << 24).toDouble

  /** Buffer length for dimension d: 1 count + d sums + d(d+1)/2
    * upper-triangular products.
    */
  def bufLen(dim: Int): Int = 1 + dim + dim * (dim + 1) / 2

  /** Index of the (i,j) upper-triangular product (i ≤ j) within the
    * product section: row-major over rows of decreasing length.
    */
  def triIdx(dim: Int, i: Int, j: Int): Int =
    i * dim - i * (i - 1) / 2 + (j - i)

  /** Serializable trained projection (rows = components, already
    * whitened if requested at train time). Projection state rebuilds
    * lazily on executors like the tokenizer models.
    */
  final class Transform(val mean: Array[Double],
                        val comps: Array[Array[Double]])
      extends Serializable {
    require(comps.forall(_.length == mean.length),
      s"component/mean arity mismatch: mean ${mean.length}, " +
        s"components ${comps.map(_.length).toSeq}")

    /** y_k = Σ_i comps(k)(i)·(x_i − mean_i), accumulated in double in
      * ascending i (fixed op order — bit-reproducible), emitted as
      * float so the projected column types like any embedding.
      */
    def project(a: ArrayData): GenericArrayData = {
      val x = a.toFloatArray()
      val d = mean.length
      if (x.length != d)
        throw new IllegalArgumentException(
          s"pca_project: embedding has ${x.length} dims, model has $d")
      val centered = new Array[Double](d)
      var i = 0
      while (i < d) { centered(i) = x(i).toDouble - mean(i); i += 1 }
      val out = new Array[Any](comps.length)
      var k = 0
      while (k < comps.length) {
        val row = comps(k)
        var s = 0.0
        var j = 0
        while (j < d) { s += row(j) * centered(j); j += 1 }
        out(k) = s.toFloat
        k += 1
      }
      new GenericArrayData(out)
    }
  }
}

/** `gram_matrix_agg(embedding, dim)` — one-pass (n, Σx, Σxxᵀ) moment
  * aggregate over `array<float>` embeddings, fixed-point longs
  * throughout (see [[Pca]]). Returns the raw long buffer; the trainer
  * decodes it driver-side. A wrong-length or null-element vector fails
  * loudly (a silent skip would bias the moments).
  */
case class GramMatrixAgg(child: Expression, dim: Int,
                         override val mutableAggBufferOffset: Int = 0,
                         override val inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_matrix_agg requires array<float>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "gram_matrix_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](Pca.bufLen(dim))

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[ArrayData].toFloatArray()
      if (x.length != dim)
        throw new IllegalArgumentException(
          s"gram_matrix_agg: embedding has ${x.length} dims, expected $dim")
      buf(0) += 1L
      var i = 0
      while (i < dim) {
        val xi = x(i).toDouble
        buf(1 + i) += Math.round(xi * Pca.Scale)
        var j = i
        val base = 1 + dim + Pca.triIdx(dim, i, i)
        while (j < dim) {
          buf(base + (j - i)) += Math.round(xi * x(j).toDouble * Pca.Scale)
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(o: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): GramMatrixAgg = copy(child = cs.head)
}

/** `pca_project(embedding, mean, comps_flat, out_dim)` — project an
  * `array<float>` embedding through a trained [[Pca.Transform]] given as
  * constant arrays (mean d-long, components flattened row-major
  * out_dim×d). Codegen'd: the transform is a reference object on the
  * generated class, so the projection fuses into the corpus scan like
  * every tokenizer/quantizer kernel; output is `array<float>` so the
  * projected column flows straight into `cosine_sim`/the ANN operators.
  */
case class PcaProject(child: Expression, mean: Seq[Double],
                      compsFlat: Seq[Double], outDim: Int)
    extends UnaryExpression {

  require(outDim > 0 && mean.nonEmpty &&
    compsFlat.length == outDim * mean.length,
    s"pca_project: ${compsFlat.length} weights for outDim=$outDim × " +
      s"dim=${mean.length}")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pca_project requires array<float> input, got $t")
  }

  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def prettyName: String = "pca_project"

  @transient private lazy val transform = {
    val d = mean.length
    new Pca.Transform(mean.toArray,
      Array.tabulate(outDim)(k => compsFlat.slice(k * d, (k + 1) * d).toArray))
  }

  override def nullSafeEval(v: Any): Any =
    transform.project(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("pcaTransform", transform,
      classOf[Pca.Transform].getName)
    defineCodeGen(ctx, ev, c =>
      s"$m.project((org.apache.spark.sql.catalyst.util.ArrayData) $c)")
  }

  override protected def withNewChildInternal(c: Expression): PcaProject =
    copy(child = c)
}
