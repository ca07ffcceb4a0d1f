package graft.operators

import graft.functions.{Pca => PcaKernel}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA / whitening for embedding columns — the linear pre-transform tier
  * of a production ANN stack (Faiss `PCAMatrix` / the rotation half of
  * OPQ): train a projection from corpus second moments, then rotate and
  * reduce every embedding before indexing or scoring. Used for
  * dimensionality reduction ahead of IVF/PQ (shorter codes, faster
  * scans), for whitening before cosine/dot retrieval, and for the
  * variance-explained diagnostics an embedding-quality audit reads.
  *
  * Scale shape: the ONLY corpus pass is the one-shot
  * `gram_matrix_agg` aggregation ([[graft.functions.GramMatrixAgg]] —
  * map-side-merged long buffer, dim-bounded at d + d(d+1)/2 entries, no
  * shuffle wider than one buffer per partition). The d×d
  * eigendecomposition runs driver-side (cyclic Jacobi — d ≤ a few
  * thousand for any real embedding column, so the O(d³) solve is
  * milliseconds-to-seconds and needs no cluster), exactly like the
  * IVF/PQ codebook trainings. Projection is a codegen'd scan kernel
  * (`pca_project`) — fully distributed, no shuffle, the model ships
  * once per task as a reference object.
  *
  * Determinism contract (the Verify replica re-implements every step
  * from this spec and must reproduce identical doubles):
  *  - moments accumulate as 2^24 fixed-point longs, one rounding per
  *    per-row term (see [[graft.functions.Pca]]) — partitioning-
  *    independent by integer addition;
  *  - covariance decodes as `g/2^24/n − mean_i·mean_j` with
  *    `mean = (s/2^24)/n` (that op order);
  *  - the eigensolve is CYCLIC Jacobi: sweeps over (p,q), p ascending,
  *    q>p ascending; a pair rotates only if |A(p)(q)| > 1e-12;
  *    θ = (A(q)(q) − A(p)(p)) / (2·A(p)(q)),
  *    t = sign(θ)/(|θ| + √(θ²+1)), c = 1/√(t²+1), s = t·c; the update
  *    is column rotation (k ascending) then row rotation (k ascending),
  *    V takes the column rotation; sweeps stop when Σ_{p<q} A(p)(q)²
  *    < 1e-18 or after 100 sweeps;
  *  - eigenpairs order by eigenvalue desc, then original column index
  *    asc; each eigenvector's sign is normalized so its
  *    largest-|weight| entry (first index on a tie) is positive;
  *  - whitening divides component k by √(max(λ_k, 1e-12));
  *  - mean, eigenvalues, and component weights round HALF_UP to 6 dp —
  *    the ROUNDED table IS the artifact; projection replays it, so
  *    engine and oracle replica project under identical doubles.
  */
object Pca {

  /** A trained projection: corpus mean (d), the kept eigenvalues
    * (outDim, variance per component — whitened or not, these are the
    * RAW covariance eigenvalues), and the component rows (outDim × d,
    * whitened already if requested). All values 6-dp-rounded.
    */
  final case class PcaModel(mean: Array[Double], eigenvalues: Array[Double],
                            components: Array[Array[Double]]) {
    def dim: Int = mean.length
    def outDim: Int = components.length
  }

  private[operators] def round6(v: Double): Double =
    BigDecimal(v).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** Cyclic-Jacobi symmetric eigensolve under the object-doc spec,
    * shared by PCA training and the OPQ Procrustes SVD
    * ([[Similarity.opqTrain]]): diagonalizes `a` IN PLACE (eigenvalues
    * land on the diagonal) and returns the accumulated rotation V
    * (eigenvector j is column j, `v(r)(j)`). Fully pinned op order —
    * the Verify replicas re-derive it from the spec alone.
    */
  private[operators] def jacobiEigInPlace(a: Array[Array[Double]]): Array[Array[Double]] = {
    val dim = a.length
    val v = Array.tabulate(dim, dim)((r, c) => if (r == c) 1.0 else 0.0)
    var sweep = 0
    var converged = false
    while (sweep < 100 && !converged) {
      var p = 0
      while (p < dim - 1) {
        var q = p + 1
        while (q < dim) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-12) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < dim) { // column rotation: A := A·J, V := V·J
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
            k = 0
            while (k < dim) { // row rotation: A := Jᵀ·A
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      var off = 0.0
      var r = 0
      while (r < dim - 1) {
        var cIdx = r + 1
        while (cIdx < dim) { off += a(r)(cIdx) * a(r)(cIdx); cIdx += 1 }
        r += 1
      }
      converged = off < 1e-18
      sweep += 1
    }
    v
  }

  /** Driver-side eigendecomposition + component selection from a raw
    * moment buffer (the [[graft.functions.GramMatrixAgg]] layout). Split
    * from [[pcaTrain]] so specs can exercise the solver on planted
    * moments.
    */
  def trainFromMoments(buf: Array[Long], dim: Int, outDim: Int,
                       whiten: Boolean): PcaModel = {
    require(buf.length == PcaKernel.bufLen(dim),
      s"moment buffer has ${buf.length} entries, dim $dim needs " +
        s"${PcaKernel.bufLen(dim)}")
    val n = buf(0)
    require(n >= 2, s"pcaTrain: need at least 2 vectors, got $n")
    require(outDim >= 1 && outDim <= dim,
      s"pcaTrain: outDim $outDim outside 1..$dim")
    val nd = n.toDouble
    val mean = Array.tabulate(dim)(i => buf(1 + i).toDouble / PcaKernel.Scale / nd)
    val a = Array.ofDim[Double](dim, dim)
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val g = buf(1 + dim + PcaKernel.triIdx(dim, i, j)).toDouble
        val c = g / PcaKernel.Scale / nd - mean(i) * mean(j)
        a(i)(j) = c
        a(j)(i) = c
        j += 1
      }
      i += 1
    }
    // cyclic Jacobi (spec in the object doc)
    val v = jacobiEigInPlace(a)
    val order = (0 until dim).sortBy(j => (-a(j)(j), j)).take(outDim)
    val eig = order.map(j => a(j)(j)).toArray
    val comps = order.zipWithIndex.map { case (j, k) =>
      val vec = Array.tabulate(dim)(r => v(r)(j))
      // sign: largest-|weight| entry (first on tie) positive
      var m = 0
      var best = math.abs(vec(0))
      var r = 1
      while (r < dim) {
        val ab = math.abs(vec(r))
        if (ab > best) { best = ab; m = r }
        r += 1
      }
      val signed = if (vec(m) < 0) vec.map(x => -x) else vec
      val scaled =
        if (whiten) {
          val w = math.sqrt(math.max(eig(k), 1e-12))
          signed.map(_ / w)
        } else signed
      scaled.map(round6)
    }.toArray
    PcaModel(mean.map(round6), eig.map(round6), comps)
  }

  /** Train a PCA projection on the corpus `embedding` column: one
    * `gram_matrix_agg` pass (the only corpus scan), driver Jacobi solve.
    */
  def pcaTrain(corpus: DataFrame, outDim: Int,
               whiten: Boolean = false): PcaModel = {
    val vecs = corpus.filter(col("embedding").isNotNull)
    val probe = vecs.select(size(col("embedding"))).limit(1).collect()
    require(probe.nonEmpty, "pcaTrain: empty corpus (no non-null embeddings)")
    val dim = probe.head.getInt(0)
    Similarity.failOnBadEmbeddings(vecs, dim, "pcaTrain")
    val buf = vecs
      .agg(call_function("gram_matrix_agg", col("embedding"), lit(dim))
        .as("moments"))
      .collect().head.getSeq[Long](0).toArray
    trainFromMoments(buf, dim, outDim, whiten)
  }

  /** Projected embedding column under a trained model — codegen-fused
    * scan work (`pca_project`), emitting `array<float>` so the result
    * types like any embedding and flows into the ANN operators.
    */
  def pcaProjectCol(embedding: Column, model: PcaModel): Column =
    call_function("pca_project", embedding,
      lit(model.mean), lit(model.components.flatten),
      lit(model.outDim))

  /** Replace `embedding` with its projection (all other columns kept) —
    * the corpus-prep step before building a reduced-dimension index.
    */
  def pcaProject(df: DataFrame, model: PcaModel): DataFrame =
    df.withColumn("embedding", pcaProjectCol(col("embedding"), model))

  /** Trained model as a DataFrame — one row per (component, dim_idx)
    * weight with the component's eigenvalue alongside (persistence and
    * the oracle gate).
    */
  def modelDf(spark: org.apache.spark.sql.SparkSession,
              model: PcaModel): DataFrame = {
    import spark.implicits._
    val rows = for {
      k <- model.components.indices
      i <- 0 until model.dim
    } yield (k, i, model.components(k)(i), model.eigenvalues(k), model.mean(i))
    rows.toDF("component", "dim_idx", "weight", "eigenvalue", "mean")
  }

  /** Persist a trained model (the one-directory artifact: every later
    * job loads instead of retraining).
    */
  def savePca(spark: org.apache.spark.sql.SparkSession, model: PcaModel,
              dir: String): Unit =
    modelDf(spark, model).coalesce(1).write.mode("overwrite").parquet(dir)

  /** Load a persisted model (parquet round-trips the 6-dp doubles
    * bit-exactly, so a loaded model projects identically).
    */
  def loadPca(spark: org.apache.spark.sql.SparkSession,
              dir: String): PcaModel = {
    val rows = spark.read.parquet(dir)
      .select("component", "dim_idx", "weight", "eigenvalue", "mean")
      .collect()
    require(rows.nonEmpty, s"loadPca: no model rows under $dir")
    val outDim = rows.map(_.getInt(0)).max + 1
    val dim = rows.map(_.getInt(1)).max + 1
    val comps = Array.ofDim[Double](outDim, dim)
    val eig = new Array[Double](outDim)
    val mean = new Array[Double](dim)
    rows.foreach { r =>
      comps(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
      eig(r.getInt(0)) = r.getDouble(3)
      mean(r.getInt(1)) = r.getDouble(4)
    }
    PcaModel(mean, eig, comps)
  }
}
