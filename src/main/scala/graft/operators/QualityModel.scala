package graft.operators

import graft.functions.Functions.{murmur64, strict_exp}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** TRAINABLE document classifier: logistic regression with heavy-ball
  * momentum over hashed, L2-normalized binary bag-of-words features (the
  * fastText-linear /
  * FineWeb-Edu-distillation shape — modern curation pipelines score
  * documents with a small learned model distilled from expensive labels,
  * not just hand rules).
  *
  * Scale + reproducibility design:
  *  - Features are murmur-hashed token ids mod `dim`, binary presence
  *    scaled by 1/sqrt(m) (m = the doc's distinct-feature count) — no
  *    vocabulary table, no dictionary shuffle, dimensionality fixed up
  *    front (hashing trick, Weinberger 2009). The L2 normalization is
  *    load-bearing: it makes a gradient step move every doc's margin by
  *    ~lr*(mean error) regardless of how many features the doc carries,
  *    where raw binary features give the shared-word direction an
  *    m-times-larger effective step and full-batch GD oscillates
  *    without ever refining the discriminative weights.
  *  - The token stream collapses ONCE to a cached distinct (doc, feature)
  *    table partitioned by doc id; every iteration's per-doc margin
  *    aggregation reuses that partitioning (no re-shuffle), and the
  *    gradient reduce is keyed by feature id — at most `dim` rows out,
  *    whatever the corpus size.
  *  - Weights travel as a broadcast scaled-long literal (dim-bounded);
  *    the corpus never moves for them.
  *  - Everything that crosses a merge tree accumulates in FIXED-POINT
  *    (scaled-long) arithmetic, the same contract as the IVF trainer:
  *    long addition is associative+commutative, so margins, gradients —
  *    and therefore the trained weights — are bit-identical under any
  *    partitioning/AQE decision. A double `sum` would drift with
  *    reduction order and make the model un-oracle-able.
  *  - Full-batch gradient descent, `iters` passes over the cached
  *    feature table. At 100 TB the standard move is training on a
  *    bounded sample of the corpus and scoring everything — scoring
  *    ([[score]]) is a shuffle-free codegen-fused fold over the token
  *    array.
  */
object QualityModel {

  /** Fixed-point scale shared by margins and gradients (2^24 ≈ 7
    * significant digits — matches [[Similarity.fixedPointScale]]).
    */
  val fixedPointScale: Double = Similarity.fixedPointScale

  private[operators] val hashSeed = 0x9e37L

  /** Scaled-long encoding: round(x·2^24), HALF_UP on the double product —
    * the same arithmetic Spark's `round(col * lit(fixedPointScale))`
    * performs, so driver-side and in-plan encodings agree bit-for-bit.
    * Shared with [[MulticlassModel]].
    */
  private[operators] def fpLong(x: Double): Long =
    BigDecimal(x * fixedPointScale)
      .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong

  /** Feature id of a token: pmod(murmur64(token), dim). */
  private[operators] def featCol(word: Column, dim: Int): Column =
    pmod(murmur64(word, lit(hashSeed)), lit(dim.toLong)).cast("int")

  /** Heavy-ball momentum coefficient: logistic loss over near-duplicate
    * feature vectors is ill-conditioned (one shared direction, weak
    * discriminative ones) and plain full-batch GD needs ~10× the passes.
    */
  private[operators] val momentum = 0.9

  /** The cached (did, y, sm, f) feature table both trainers iterate: one
    * pass over raw text to distinct hashed-feature presence pairs,
    * did-partitioned so every pass's margin aggregation reuses the
    * partitioning. Token-less docs (and rows failing `yFilter`, which is
    * evaluated against the projected `y` column — the multiclass
    * null-label cut) carry no gradient. Caller unpersists.
    */
  private[operators] def featureTable(docs: DataFrame, idCol: String,
                                      textCol: String, yCol: Column,
                                      yFilter: Column, dim: Int): DataFrame =
    docs
      .select(col(idCol).as("did"), yCol.as("y"),
        Tokenizer.preTokens(col(textCol)).as("ws"))
      .filter(yFilter && size(col("ws")) > 0)
      .select(col("did"), col("y"),
        call_function("hash_features", col("ws"), lit(dim), lit(hashSeed)).as("fs"))
      .select(col("did"), col("y"),
        sqrt(size(col("fs")).cast("double")).as("sm"), explode(col("fs")).as("f"))
      .repartition(col("did")).cache()

  /** Driver replica of Spark's `round(doubleCol).cast("long")` (HALF_UP on
    * BigDecimal.valueOf — the RoundBase path), for the local training folds.
    */
  private[operators] def roundHalfUpLong(x: Double): Long =
    java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong

  /** Collected per-doc view of [[featureTable]] for the size-adaptive
    * driver fold (the PageRank-local principle applied to the GD loop):
    * training corpora are bounded by design — "train on a bounded sample,
    * score everything" is the 100 TB posture — so when the cached feature
    * table fits the conf'd row budget, ship it to the driver ONCE and run
    * every gradient pass in memory instead of one Spark job per pass.
    * Returns None above the budget (the distributed loop then runs).
    * `y` is carried as double (the binary trainer's label) holding an
    * integral class index for the multiclass trainer.
    */
  private[operators] final case class LocalFeats(
      y: Array[Double], sm: Array[Double], fs: Array[Array[Int]]) {
    def nDocs: Double = y.length.toDouble
  }
  private[operators] def collectLocalFeats(feats: DataFrame): Option[LocalFeats] = {
    val maxRows = feats.sparkSession.conf
      .get("spark.graft.train.localIterMaxRows", (1L << 22).toString).toLong
    if (feats.count() > maxRows) None
    else {
      val rows = feats.select("did", "y", "sm", "f").collect()
      def yOf(r: org.apache.spark.sql.Row): Double = r.get(1) match {
        case d: java.lang.Double => d.doubleValue()
        case i: java.lang.Integer => i.doubleValue()
        case other => throw new IllegalStateException(s"unexpected y: $other")
      }
      val m = new java.util.LinkedHashMap[Any,
        (Double, Double, scala.collection.mutable.ArrayBuffer[Int])]()
      rows.foreach { r =>
        var e = m.get(r.get(0))
        if (e == null) {
          e = (yOf(r), r.getDouble(2), scala.collection.mutable.ArrayBuffer.empty[Int])
          m.put(r.get(0), e)
        }
        e._3 += r.getInt(3)
      }
      import scala.jdk.CollectionConverters._
      val docs = m.values().asScala.toArray
      Some(LocalFeats(docs.map(_._1), docs.map(_._2), docs.map(_._3.toArray)))
    }
  }

  /** Train logistic-regression weights on (textCol, labelCol) where
    * labelCol is boolean/0-1 and idCol uniquely keys a document. Returns
    * the dense weight vector (length `dim`). Deterministic for a given
    * input set.
    */
  def train(docs: DataFrame, idCol: String, textCol: String, labelCol: String,
            dim: Int = 1024, iters: Int = 24, lr: Double = 3.0): Array[Double] = {
    val feats = featureTable(docs, idCol, textCol,
      col(labelCol).cast("double"), lit(true), dim)
    collectLocalFeats(feats) match {
      case Some(lf) =>
        // in-memory fold of the IDENTICAL per-pass arithmetic (long margin
        // sums, StrictMath sigmoid, HALF_UP scaled-long per-row gradients,
        // long gradient sums, the same update) — bit-equal to the
        // distributed loop below, spec-pinned
        feats.unpersist()
        val w = new Array[Double](dim)
        val v = new Array[Double](dim)
        val n = lf.nDocs
        (1 to iters).foreach { _ =>
          val wFp = w.map(fpLong)
          val gfp = new Array[Long](dim)
          var d = 0
          while (d < lf.y.length) {
            val fs = lf.fs(d)
            var mfp = 0L
            var i = 0
            while (i < fs.length) { mfp += wFp(fs(i)); i += 1 }
            val p = 1.0 / (1.0 +
              StrictMath.exp(-(mfp.toDouble / fixedPointScale / lf.sm(d))))
            val gRow = roundHalfUpLong((p - lf.y(d)) / lf.sm(d) * fixedPointScale)
            i = 0
            while (i < fs.length) { gfp(fs(i)) += gRow; i += 1 }
            d += 1
          }
          var f = 0
          while (f < dim) {
            val g = (gfp(f).toDouble / fixedPointScale) / n
            v(f) = momentum * v(f) + g
            w(f) = w(f) - lr * v(f)
            f += 1
          }
        }
        return w
      case None => ()
    }
    val nDocs = feats.select(countDistinct(col("did"))).head().getLong(0).toDouble
    val w = new Array[Double](dim)
    val v = new Array[Double](dim)
    try {
      (1 to iters).foreach { _ =>
        val wFp = w.map(fpLong)
        // margin_fp(doc) = Σ_{f present} round(w_f·FP): exact integer
        // sum, order-independent; reuses the did partitioning. The
        // 1/sqrt(m) feature scale divides once outside the sum.
        val margins = feats
          .select(col("did"), col("sm"), element_at(lit(wFp), col("f") + 1).as("mfp"))
          .groupBy("did").agg(sum(col("mfp")).as("mfp"), first(col("sm")).as("sm"))
          .select(col("did"),
            (lit(1.0) / (lit(1.0) + strict_exp(
              -(col("mfp").cast("double") / lit(fixedPointScale) / col("sm"))))).as("p"))
        // grad_f = Σ_{docs containing f} (p-y)/sqrt(m): per-row double
        // rounds to a scaled long BEFORE the cross-partition sum
        val grad = feats.join(margins, Seq("did"))
          .select(col("f"),
            round((col("p") - col("y")) / col("sm") * lit(fixedPointScale)).cast("long").as("gfp"))
          .groupBy("f").agg(sum(col("gfp")).as("gfp"))
          .collect()
        // dense driver-side update: the velocity decays on EVERY
        // dimension each pass, including zero-gradient ones
        val g = new Array[Double](dim)
        grad.foreach { r =>
          g(r.getInt(0)) = (r.getLong(1).toDouble / fixedPointScale) / nDocs
        }
        var f = 0
        while (f < dim) {
          v(f) = momentum * v(f) + g(f)
          w(f) = w(f) - lr * v(f)
          f += 1
        }
      }
    } finally feats.unpersist()
    w
  }

  /** Persist trained weights (index-keyed parquet): the classifier
    * artifact — train once on a bounded sample, load everywhere.
    */
  def saveWeights(spark: org.apache.spark.sql.SparkSession, weights: Array[Double],
                  dir: String): Unit = {
    import spark.implicits._
    weights.zipWithIndex.map { case (x, i) => (i, x) }.toSeq.toDF("f", "w")
      .coalesce(1).write.mode("overwrite").parquet(dir)
  }

  /** Load persisted weights as the dense vector [[score]] takes. */
  def loadWeights(spark: org.apache.spark.sql.SparkSession, dir: String): Array[Double] = {
    val rows = spark.read.parquet(dir).select("f", "w").collect()
    val w = new Array[Double](rows.length)
    rows.foreach(r => w(r.getInt(0)) = r.getDouble(1))
    w
  }

  /** Scan-fused scoring under trained weights: the margin folds the
    * doc's distinct feature ids against the broadcast scaled-long weight
    * literal — zero shuffles, exactly the arithmetic [[train]] used, so
    * a doc's training-time probability is its scoring-time probability.
    */
  def score(text: Column, weights: Array[Double], dim: Int): Column =
    // ONE fused codegen kernel (FpClassifier.FpSigmoid): the Column
    // composition referenced the feature subtree several times, and those
    // higher-order pipelines are CodegenFallback — interpreted per
    // EVALUATION with no subexpression elimination, so each row paid the
    // tokenize+hash+fold repeatedly. Identical arithmetic: murmur-pmod
    // distinct ids, exact long margin, m/2^24/sqrt(|fs|), StrictMath
    // sigmoid; null text -> null score (not 0.5: a silent p=0.5 would
    // sail through a keep-if-positive curation gate); token-less -> 0.5.
    call_function("fp_sigmoid", Tokenizer.preTokens(text),
      lit(weights.map(fpLong)), lit(dim), lit(hashSeed))
}
