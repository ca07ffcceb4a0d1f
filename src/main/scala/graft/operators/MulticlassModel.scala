package graft.operators

import graft.functions.Functions.strict_exp
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINABLE multiclass document classifier: softmax regression with
  * heavy-ball momentum over hashed, L2-normalized binary bag-of-words
  * features — the fastText-supervised shape, generalizing
  * [[QualityModel]]'s binary gate to K labels. The curation uses are the
  * multiclass ones: domain/source tagging for mixture rebalancing
  * (DoReMi-style), topic routing, language identification once labeled
  * text exists.
  *
  * Scale + reproducibility design (inherited from [[QualityModel]], see
  * its scaladoc for the why of each piece):
  *  - hashed features, no vocabulary shuffle; 1/sqrt(m) L2 presence
  *    scaling; one cached did-partitioned (doc, feature) table reused by
  *    every pass.
  *  - per-iteration work: ONE groupBy(did) computing all K margins as
  *    exact scaled-long sums, softmax in a FIXED class order (the
  *    left-fold denominator makes the double arithmetic
  *    order-deterministic), then ONE (f, k)-keyed gradient reduce — at
  *    most dim×K rows out, whatever the corpus size.
  *  - weights ride as K broadcast scaled-long literals; everything that
  *    crosses a merge tree is fixed-point, so the trained model is
  *    bit-identical under any partitioning.
  *  - prediction ([[predict]]) is a shuffle-free scan-fused fold; the
  *    argmax compares EXACT integer margins (the 1/sqrt(m) scale is
  *    class-independent, so it cancels and never touches the
  *    comparison), ties break to the lowest class index.
  */
object MulticlassModel {

  /** Trained model: class labels in sorted order, one weight row per
    * class. The artifact is bounded (K × dim doubles) — train once on a
    * bounded labeled sample, broadcast everywhere.
    */
  final case class Model(classes: Seq[String], weights: Array[Array[Double]], dim: Int) {
    require(classes.nonEmpty && classes.length == weights.length,
      s"MulticlassModel: ${classes.length} classes vs ${weights.length} weight rows")
  }

  import QualityModel.{featCol, fpLong, momentum}

  private val fpScale = QualityModel.fixedPointScale

  /** Train softmax weights on (textCol, labelCol); rows with a null label
    * or no tokens carry no gradient. Class order is the sorted distinct
    * label set, so the model layout is input-determined. Deterministic
    * for a given input set.
    */
  def train(docs: DataFrame, idCol: String, textCol: String, labelCol: String,
            dim: Int = 1024, iters: Int = 24, lr: Double = 3.0): Model = {
    val classes = docs.select(col(labelCol).cast("string").as("c"))
      .filter(col("c").isNotNull).distinct()
      .orderBy("c").collect().map(_.getString(0)).toSeq
    require(classes.size >= 2,
      s"MulticlassModel.train: need >= 2 classes, got ${classes.size}")
    val k = classes.size
    val feats = QualityModel.featureTable(docs, idCol, textCol,
      (array_position(typedLit(classes), col(labelCol).cast("string")) - 1)
        .cast("int"),
      // array_position is 0 (so y = -1) for null/unknown labels
      col("y") >= 0, dim)
    QualityModel.collectLocalFeats(feats) match {
      case Some(lf) =>
        // size-adaptive driver fold (see [[QualityModel.collectLocalFeats]]):
        // identical long margins, zmax-guarded StrictMath softmax with the
        // same left-fold denominator, HALF_UP scaled-long per-row gradients,
        // long sums, same update — bit-equal to the distributed loop,
        // spec-pinned
        feats.unpersist()
        val w = Array.fill(k)(new Array[Double](dim))
        val v = Array.fill(k)(new Array[Double](dim))
        val n = lf.nDocs
        (1 to iters).foreach { _ =>
          val wFp = w.map(_.map(fpLong))
          val gfp = Array.fill(k)(new Array[Long](dim))
          var d = 0
          while (d < lf.y.length) {
            val fs = lf.fs(d)
            val sm = lf.sm(d)
            val zs = new Array[Double](k)
            var ki = 0
            while (ki < k) {
              var mfp = 0L
              var i = 0
              while (i < fs.length) { mfp += wFp(ki)(fs(i)); i += 1 }
              zs(ki) = mfp.toDouble / fpScale / sm
              ki += 1
            }
            var zmax = zs(0)
            ki = 1
            while (ki < k) { if (zs(ki) > zmax) zmax = zs(ki); ki += 1 }
            val exps = zs.map(z => StrictMath.exp(z - zmax))
            var denom = exps(0)
            ki = 1
            while (ki < k) { denom += exps(ki); ki += 1 }
            ki = 0
            while (ki < k) {
              val p = exps(ki) / denom
              val ind = if (lf.y(d) == ki) 1.0 else 0.0
              val gRow = QualityModel.roundHalfUpLong((p - ind) / sm * fpScale)
              var i = 0
              while (i < fs.length) { gfp(ki)(fs(i)) += gRow; i += 1 }
              ki += 1
            }
            d += 1
          }
          var ki = 0
          while (ki < k) {
            var f = 0
            while (f < dim) {
              val g = (gfp(ki)(f).toDouble / fpScale) / n
              v(ki)(f) = momentum * v(ki)(f) + g
              w(ki)(f) = w(ki)(f) - lr * v(ki)(f)
              f += 1
            }
            ki += 1
          }
        }
        return Model(classes, w, dim)
      case None => ()
    }
    val nDocs = feats.select(countDistinct(col("did"))).head().getLong(0).toDouble
    val w = Array.fill(k)(new Array[Double](dim))
    val v = Array.fill(k)(new Array[Double](dim))
    try {
      (1 to iters).foreach { _ =>
        val wFp = w.map(_.map(fpLong))
        // all K margins in ONE did-keyed aggregation (exact integer sums)
        val aggCols = (0 until k).map(i =>
          sum(element_at(lit(wFp(i)), col("f") + 1)).as(s"m$i")) :+
          first(col("sm")).as("sm")
        val margins = feats.groupBy("did").agg(aggCols.head, aggCols.tail: _*)
        // softmax in FIXED class order: zmax guard, left-fold denominator
        val zs = (0 until k).map(i =>
          col(s"m$i").cast("double") / lit(fpScale) / col("sm"))
        val zmax = greatest(zs: _*)
        val exps = zs.map(z => strict_exp(z - zmax))
        val denom = exps.reduce(_ + _)
        // only did + probabilities: y and sm come back from the feats
        // side of the join below (duplicating them here would make the
        // gradient's column references ambiguous)
        val ps = margins.select(
          col("did") +: (0 until k).map(i => (exps(i) / denom).as(s"p$i")): _*)
        // grad_{f,k} = Σ_docs (p_k - [y==k])/sqrt(m), rounded to a scaled
        // long per row BEFORE the cross-partition sum
        val gCols = (0 until k).map(i =>
          round((col(s"p$i") - when(col("y") === i, 1.0).otherwise(0.0)) /
            col("sm") * lit(fpScale)).cast("long"))
        val grad = feats.join(ps, Seq("did"))
          .select(col("f"), posexplode(array(gCols: _*)))
          .toDF("f", "k", "gfp")
          .groupBy("f", "k").agg(sum(col("gfp")).as("gfp"))
          .collect()
        val g = Array.fill(k)(new Array[Double](dim))
        grad.foreach { r =>
          g(r.getInt(1))(r.getInt(0)) = (r.getLong(2).toDouble / fpScale) / nDocs
        }
        var ki = 0
        while (ki < k) {
          var f = 0
          while (f < dim) {
            v(ki)(f) = momentum * v(ki)(f) + g(ki)(f)
            w(ki)(f) = w(ki)(f) - lr * v(ki)(f)
            f += 1
          }
          ki += 1
        }
      }
    } finally feats.unpersist()
    Model(classes, w, dim)
  }

  /** Flat k×dim scaled-long weight table the fused kernels take. */
  private def flatFp(model: Model): Seq[Long] =
    model.weights.toSeq.flatMap(_.map(fpLong).toSeq)

  /** Predicted class label. The argmax compares the EXACT integer
    * margins (1/sqrt(m) cancels across classes), ties break to the
    * lowest class index — fully deterministic. Null text and token-less
    * text predict null (no evidence — a silent majority-class answer
    * would sail through a routing gate). ONE fused codegen kernel
    * (FpClassifier.FpArgmax) — the Column greatest-over-structs form
    * re-evaluated the interpreted margin subtrees per comparison.
    */
  def predict(text: Column, model: Model): Column =
    element_at(typedLit(model.classes),
      call_function("fp_argmax", Tokenizer.preTokens(text),
        lit(flatFp(model).toArray), lit(model.classes.size), lit(model.dim),
        lit(QualityModel.hashSeed)) + 1)

  /** Softmax probabilities, classes in [[Model.classes]] order — the
    * same fixed-order arithmetic training used, so a doc's training-time
    * distribution is its scoring-time distribution. Null/token-less
    * text yields null. ONE fused codegen kernel (FpClassifier.FpSoftmax):
    * the Column composition (zmax guard + left-fold denominator + K
    * probability columns) referenced the interpreted margin subtrees
    * O(K²) times per row; the kernel hashes and folds once, with the
    * identical zmax-guarded StrictMath arithmetic.
    */
  def scores(text: Column, model: Model): Column =
    call_function("fp_softmax", Tokenizer.preTokens(text),
      lit(flatFp(model).toArray), lit(model.classes.size), lit(model.dim),
      lit(QualityModel.hashSeed))

  /** Per-class classification report over a (label, prediction) pair
    * table — the evaluation table every classifier-gated curation
    * decision should read before the gate ships: per class support,
    * tp/fp/fn, precision, recall, F1, plus a `__macro__` row (fixed-
    * point mean of the per-class 6dp metrics — micro-long sums, so the
    * average is partitioning-independent) and a `__micro__` row (pooled
    * tp/fp/fn; for single-label prediction micro-P = micro-R = micro-F1
    * = accuracy). Null predictions (the classifier's no-evidence answer)
    * count as fn for their true class and fp for no class — exactly how
    * an abstaining gate costs you.
    *
    * Shape at scale: two class-keyed aggregations over the pair stream
    * (map-side partials), one class-keyed outer join, and class-count-
    * bounded summary rows — never a collect of the corpus.
    */
  def classificationReport(pairs: org.apache.spark.sql.DataFrame,
                           labelCol: String,
                           predCol: String): org.apache.spark.sql.DataFrame = {
    val p = pairs.select(col(labelCol).as("_y"), col(predCol).as("_p"))
    val byLabel = p.filter(col("_y").isNotNull).groupBy(col("_y").as("label"))
      .agg(count(lit(1)).as("support"),
        sum(when(col("_p") === col("_y"), 1L).otherwise(0L)).as("_tpl"))
    val byPred = p.filter(col("_p").isNotNull).groupBy(col("_p").as("label"))
      .agg(count(lit(1)).as("_predn"))
    val q = (x: org.apache.spark.sql.Column, d: org.apache.spark.sql.Column) =>
      when(d > 0, round(x.cast("double") / d.cast("double"), 6)).otherwise(lit(0.0))
    val perClass = byLabel.join(byPred, Seq("label"), "full")
      .select(col("label"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("_tpl"), lit(0L)).as("tp"),
        (coalesce(col("_predn"), lit(0L)) - coalesce(col("_tpl"), lit(0L))).as("fp"),
        (coalesce(col("support"), lit(0L)) - coalesce(col("_tpl"), lit(0L))).as("fn"))
      .select(col("label"), col("support"), col("tp"), col("fp"), col("fn"),
        q(col("tp"), col("tp") + col("fp")).as("precision"),
        q(col("tp"), col("tp") + col("fn")).as("recall"))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0,
          round(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall")), 6)).otherwise(lit(0.0)))
    // macro: fixed-point mean of the per-class rounded metrics (micro-
    // long sums — partitioning-independent); micro: pooled counts
    def microMean(c: String) =
      round((sum(round(col(c) * 1e6).cast("long")).cast("double") /
        count(lit(1)).cast("double")) / 1e6, 6).as(c)
    val macroRow = perClass.agg(sum(col("support")).as("support"),
        sum(col("tp")).as("tp"), sum(col("fp")).as("fp"),
        sum(col("fn")).as("fn"), microMean("precision"),
        microMean("recall"), microMean("f1"))
      .withColumn("label", lit("__macro__"))
    val microRow = perClass.agg(sum(col("support")).as("support"),
        sum(col("tp")).as("tp"), sum(col("fp")).as("fp"),
        sum(col("fn")).as("fn"))
      .select(lit("__micro__").as("label"), col("support"), col("tp"),
        col("fp"), col("fn"),
        q(col("tp"), col("tp") + col("fp")).as("precision"),
        q(col("tp"), col("tp") + col("fn")).as("recall"))
      .withColumn("f1",
        when(col("precision") + col("recall") > 0,
          round(lit(2.0) * col("precision") * col("recall") /
            (col("precision") + col("recall")), 6)).otherwise(lit(0.0)))
    val cols = Seq("label", "support", "tp", "fp", "fn",
      "precision", "recall", "f1").map(col)
    perClass.select(cols: _*)
      .unionByName(macroRow.select(cols: _*))
      .unionByName(microRow.select(cols: _*))
  }

  /** Persist the model (classes + weight rows, one parquet). */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model, dir: String): Unit = {
    import spark.implicits._
    model.classes.indices.flatMap { ki =>
      model.weights(ki).zipWithIndex.map { case (x, f) =>
        (ki, model.classes(ki), f, x)
      }
    }.toDF("k", "label", "f", "w")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Load a [[save]]d model. */
  def load(spark: org.apache.spark.sql.SparkSession, dir: String): Model = {
    val rows = spark.read.parquet(dir).select("k", "label", "f", "w").collect()
    val k = rows.iterator.map(_.getInt(0)).max + 1
    val dim = rows.iterator.map(_.getInt(2)).max + 1
    val classes = new Array[String](k)
    val w = Array.fill(k)(new Array[Double](dim))
    rows.foreach { r =>
      classes(r.getInt(0)) = r.getString(1)
      w(r.getInt(0))(r.getInt(2)) = r.getDouble(3)
    }
    Model(classes.toSeq, w, dim)
  }
}
