package graft

import graft.operators.Pca
import org.apache.spark.sql.functions._

class PcaSpec extends SparkSpec {

  private def vecsDf(rows: Seq[(Long, Seq[Float])]) = {
    import spark.implicits._
    graft.functions.Functions.ensure(spark)
    rows.toDF("vec_id", "embedding")
      .withColumn("embedding", col("embedding").cast("array<float>"))
  }

  test("pcaTrain recovers a planted principal axis with the documented " +
    "sign convention; trailing eigenvalue vanishes") {
    // points mean + t·(0.6, 0.8), t ∈ {-2..2}: covariance is rank one
    // with eigenvalue Σt²/n·1 = 2 along (0.6, 0.8)
    val rows = (-2 to 2).map { t =>
      (t.toLong + 2, Seq((5.0 + 0.6 * t).toFloat, (-3.0 + 0.8 * t).toFloat))
    }
    val m = Pca.pcaTrain(vecsDf(rows), outDim = 2)
    assert(math.abs(m.mean(0) - 5.0) < 1e-4 && math.abs(m.mean(1) + 3.0) < 1e-4)
    assert(math.abs(m.eigenvalues(0) - 2.0) < 1e-3, m.eigenvalues.toSeq)
    assert(math.abs(m.eigenvalues(1)) < 1e-3, m.eigenvalues.toSeq)
    // sign rule: the largest-|weight| entry (0.8) comes out positive
    assert(math.abs(m.components(0)(0) - 0.6) < 1e-3, m.components(0).toSeq)
    assert(math.abs(m.components(0)(1) - 0.8) < 1e-3, m.components(0).toSeq)
  }

  test("pca_project expression matches the driver transform through " +
    "codegen; wrong-width input fails loudly") {
    import spark.implicits._
    val rows = (0 until 20).map { i =>
      (i.toLong, Seq(math.sin(i * 1.7).toFloat, math.cos(i * 0.9).toFloat,
        (i % 5 - 2).toFloat))
    }
    val df = vecsDf(rows)
    val m = Pca.pcaTrain(df, outDim = 2)
    val engine = df.orderBy("vec_id")
      .select(Pca.pcaProjectCol(col("embedding"), m))
      .as[Seq[Float]].collect()
    val driver = new graft.functions.Pca.Transform(m.mean, m.components)
    rows.zip(engine).foreach { case ((_, e), got) =>
      val want = driver.project(new org.apache.spark.sql.catalyst.util
        .GenericArrayData(e.toArray)).toFloatArray().toSeq
      assert(got === want)
    }
    val bad = vecsDf(Seq((0L, Seq(1f, 2f))))
    val ex = intercept[Exception] {
      bad.select(Pca.pcaProjectCol(col("embedding"), m)).collect()
    }
    assert(ex.getMessage != null)
  }

  test("whitened projection has unit variance per component") {
    // two independent axes with variances 4 and 1
    val rows = (0 until 8).map { i =>
      val a = if (i % 2 == 0) 2.0 else -2.0
      val b = if (i % 4 < 2) 1.0 else -1.0
      (i.toLong, Seq(a.toFloat, b.toFloat))
    }
    val df = vecsDf(rows)
    val m = Pca.pcaTrain(df, outDim = 2, whiten = true)
    val driver = new graft.functions.Pca.Transform(m.mean, m.components)
    val proj = rows.map { case (_, e) =>
      driver.project(new org.apache.spark.sql.catalyst.util
        .GenericArrayData(e.toArray)).toFloatArray()
    }
    (0 until 2).foreach { k =>
      val xs = proj.map(_(k).toDouble)
      val mu = xs.sum / xs.length
      val varK = xs.map(x => (x - mu) * (x - mu)).sum / xs.length
      assert(math.abs(varK - 1.0) < 1e-3, s"component $k variance $varK")
    }
  }

  test("training is deterministic and partitioning-independent; the " +
    "single-buffer aggregate carries a wide dim without a wide agg") {
    // dim 128: the buffer is 1 + 128 + 128·129/2 = 8385 longs — ONE
    // aggregate column regardless of dim (the scale-safe form the
    // 2×dim-column agg family lacks)
    val dim = 128
    val rows = (0 until 40).map { i =>
      (i.toLong, (0 until dim).map(j =>
        (math.sin(i * 0.31 + j * 1.7) * (1.0 + j % 7)).toFloat))
    }
    val a = Pca.pcaTrain(vecsDf(rows), outDim = 4)
    val b = Pca.pcaTrain(vecsDf(rows).repartition(7), outDim = 4)
    assert(a.mean.toSeq === b.mean.toSeq)
    assert(a.eigenvalues.toSeq === b.eigenvalues.toSeq)
    assert(a.components.map(_.toSeq).toSeq === b.components.map(_.toSeq).toSeq)
    assert(a.eigenvalues(0) >= a.eigenvalues(1), "eigenvalues must be sorted")
  }

  test("save/load restores the model; a loaded model projects identically") {
    import spark.implicits._
    val rows = (0 until 12).map { i =>
      (i.toLong, Seq((i % 3).toFloat, (i % 4).toFloat, (i % 5).toFloat,
        math.sin(i.toDouble).toFloat))
    }
    val df = vecsDf(rows)
    val m = Pca.pcaTrain(df, outDim = 3)
    val dir = java.nio.file.Files.createTempDirectory("pca").toString
    Pca.savePca(spark, m, s"$dir/model")
    val loaded = Pca.loadPca(spark, s"$dir/model")
    assert(loaded.mean.toSeq === m.mean.toSeq)
    assert(loaded.eigenvalues.toSeq === m.eigenvalues.toSeq)
    assert(loaded.components.map(_.toSeq).toSeq === m.components.map(_.toSeq).toSeq)
    val x = df.select(Pca.pcaProjectCol(col("embedding"), m)).as[Seq[Float]].collect()
    val y = df.select(Pca.pcaProjectCol(col("embedding"), loaded)).as[Seq[Float]].collect()
    assert(x.toSeq === y.toSeq)
  }
}
