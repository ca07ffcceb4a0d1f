package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Fused scoring kernels for the trained hashed-BoW classifiers
  * ([[graft.operators.QualityModel]] / [[graft.operators.MulticlassModel]]).
  *
  * Why fused: the Column-level softmax/argmax compositions reference the
  * per-class margin subtree many times (zmax guard, denominator fold, K
  * probability columns), and those subtrees sit on CodegenFallback
  * higher-order functions — interpreted per evaluation with NO common
  * subexpression elimination — so a K-class probability row re-tokenized
  * and re-folded the margins O(K²) times. Each kernel evaluates the
  * distinct-feature hash ONCE and every margin ONCE per row, replicating
  * the exact Column arithmetic: murmur-pmod feature ids (first-occurrence
  * distinct), exact long margin sums, z = m/2^24/sqrt(|fs|), zmax-guarded
  * StrictMath softmax with the left-fold denominator, argmax on exact
  * integer margins with ties to the lowest class index. Weight tables ship
  * once per task as reference objects.
  */
object FpClassifier {

  /** Shared per-expression state: flat k×dim scaled-long weights. */
  final class Kernel(flatW: Array[Long], val k: Int, val dim: Int,
                     seed: Long, scale: Double) extends Serializable {
    require(flatW.length == k * dim,
      s"fp classifier kernel: ${flatW.length} weights != k=$k * dim=$dim")

    /** Distinct feature ids, first occurrence kept (the hash_features
      * contract), as a growing int array + count.
      */
    private def features(words: ArrayData): (Array[Int], Int) = {
      val n = words.numElements()
      val seen = new java.util.LinkedHashSet[Integer](n * 2)
      var i = 0
      while (i < n) {
        val h = CassandraMurmur3.hashString(words.getUTF8String(i).toString, seed)
        val m = (h % dim).toInt
        seen.add(if (m < 0) m + dim else m)
        i += 1
      }
      val out = new Array[Int](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { out(j) = it.next().intValue(); j += 1 }
      (out, j)
    }

    private def marginsOf(fs: Array[Int], m: Int): Array[Long] = {
      val out = new Array[Long](k)
      var ki = 0
      while (ki < k) {
        val base = ki * dim
        var s = 0L
        var i = 0
        while (i < m) { s += flatW(base + fs(i)); i += 1 }
        out(ki) = s
        ki += 1
      }
      out
    }

    /** Softmax probabilities in class order; null for token-less input
      * (the `when(size(fs) > 0, ...)` contract).
      */
    def softmax(words: ArrayData): GenericArrayData = {
      val (fs, m) = features(words)
      if (m == 0) return null
      val mg = marginsOf(fs, m)
      val sm = Math.sqrt(m.toDouble)
      val zs = new Array[Double](k)
      var i = 0
      while (i < k) { zs(i) = mg(i).toDouble / scale / sm; i += 1 }
      var zmax = zs(0)
      i = 1
      while (i < k) { if (zs(i) > zmax) zmax = zs(i); i += 1 }
      val exps = new Array[Double](k)
      i = 0
      while (i < k) { exps(i) = StrictMath.exp(zs(i) - zmax); i += 1 }
      var denom = exps(0)
      i = 1
      while (i < k) { denom += exps(i); i += 1 }
      val out = new Array[Any](k)
      i = 0
      while (i < k) { out(i) = exps(i) / denom; i += 1 }
      new GenericArrayData(out)
    }

    /** Argmax class index on EXACT integer margins, ties to the lowest
      * index; null (boxed) for token-less input.
      */
    def argmax(words: ArrayData): Integer = {
      val (fs, m) = features(words)
      if (m == 0) return null
      val mg = marginsOf(fs, m)
      var best = 0
      var i = 1
      while (i < k) { if (mg(i) > mg(best)) best = i; i += 1 }
      Integer.valueOf(best)
    }

    /** Binary sigmoid score (k == 1): token-less input scores 0.5 (margin
      * 0), matching `when(size(fs) === 0, 0.0)` feeding the sigmoid.
      */
    def sigmoid(words: ArrayData): Double = {
      val (fs, m) = features(words)
      val margin =
        if (m == 0) 0.0
        else marginsOf(fs, m)(0).toDouble / scale / Math.sqrt(m.toDouble)
      1.0 / (1.0 + StrictMath.exp(-margin))
    }
  }

  private def arrayOfStrings(t: DataType): Boolean = t match {
    case ArrayType(_: StringType, _) => true
    case _ => false
  }

  abstract class FpClassifierExpr extends UnaryExpression {
    def flatW: Seq[Long]
    def k: Int
    def dim: Int
    def seed: Long
    override def checkInputDataTypes(): TypeCheckResult =
      if (arrayOfStrings(child.dataType)) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> tokens, got ${child.dataType}")
    @transient protected lazy val kernel: Kernel =
      new Kernel(flatW.toArray, k, dim, seed,
        graft.operators.Similarity.fixedPointScale)
  }

  /** `fp_softmax(words, flatWeightsFp, k, dim, seed)` → array<double>. */
  case class FpSoftmax(child: Expression, flatW: Seq[Long], k: Int, dim: Int,
                       seed: Long) extends FpClassifierExpr {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "fp_softmax"
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = kernel.softmax(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val kRef = ctx.addReferenceObj("fpk", kernel, classOf[Kernel].getName)
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = $kRef.softmax($c);
        ${ev.isNull} = (${ev.value} == null);
      """)
    }
    override protected def withNewChildInternal(c: Expression): FpSoftmax =
      copy(child = c)
  }

  /** `fp_argmax(words, flatWeightsFp, k, dim, seed)` → int class index. */
  case class FpArgmax(child: Expression, flatW: Seq[Long], k: Int, dim: Int,
                      seed: Long) extends FpClassifierExpr {
    override def dataType: DataType = IntegerType
    override def prettyName: String = "fp_argmax"
    override def nullable: Boolean = true
    override def nullSafeEval(v: Any): Any = kernel.argmax(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val kRef = ctx.addReferenceObj("fpk", kernel, classOf[Kernel].getName)
      nullSafeCodeGen(ctx, ev, c => s"""
        java.lang.Integer ${ev.value}_tmp = $kRef.argmax($c);
        if (${ev.value}_tmp == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ${ev.value}_tmp.intValue(); }
      """)
    }
    override protected def withNewChildInternal(c: Expression): FpArgmax =
      copy(child = c)
  }

  /** `fp_sigmoid(words, weightsFp, dim, seed)` → double (k == 1). */
  case class FpSigmoid(child: Expression, flatW: Seq[Long], dim: Int,
                       seed: Long) extends FpClassifierExpr {
    override def k: Int = 1
    override def dataType: DataType = DoubleType
    override def prettyName: String = "fp_sigmoid"
    override def nullSafeEval(v: Any): Any = kernel.sigmoid(v.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val kRef = ctx.addReferenceObj("fpk", kernel, classOf[Kernel].getName)
      defineCodeGen(ctx, ev, c => s"$kRef.sigmoid($c)")
    }
    override protected def withNewChildInternal(c: Expression): FpSigmoid =
      copy(child = c)
  }
}
