package graft

import graft.operators.QualityModel
import org.apache.spark.sql.functions._

class QualityModelSpec extends SparkSpec {

  // topic-presence label (the corpus' lang column is independent of its
  // synthetic text, so it is unlearnable by construction; a text-derived
  // rule is what a distillation target looks like anyway)
  private lazy val docs = {
    graft.functions.Functions.ensure(spark)
    Tables(spark, sf, "documents")
      .filter(col("text").isNotNull)
      .withColumn("y_b",
        array_contains(graft.operators.Tokenizer.preTokens(col("text")), "spark"))
  }

  test("the local driver fold is bit-equal to the distributed GD loop " +
      "(size-adaptive switch never changes a weight)") {
    val wLocal = QualityModel.train(docs, "doc_id", "text", "y_b", dim = 256, iters = 3)
    spark.conf.set("spark.graft.train.localIterMaxRows", "0")
    try {
      val wDist = QualityModel.train(docs, "doc_id", "text", "y_b", dim = 256, iters = 3)
      assert(wLocal.toSeq === wDist.toSeq)
    } finally spark.conf.unset("spark.graft.train.localIterMaxRows")
  }

  test("training is bit-reproducible across runs (fixed-point contract)") {
    val w1 = QualityModel.train(docs, "doc_id", "text", "y_b", dim = 256, iters = 2)
    val w2 = QualityModel.train(
      docs.repartition(7), "doc_id", "text", "y_b", dim = 256, iters = 2)
    // identical bits even under a different input partitioning
    assert(w1.toSeq === w2.toSeq)
    assert(w1.exists(_ != 0.0), "training must move some weight")
  }

  test("the classifier separates the labels it was trained on") {
    val dim = 1024
    val w = QualityModel.train(docs, "doc_id", "text", "y_b", dim = dim)
    val scored = docs.select(col("y_b"),
      (QualityModel.score(col("text"), w, dim) >= 0.5).as("pred"))
    val n = scored.count().toDouble
    val correct = scored.filter(col("pred") === col("y_b")).count().toDouble
    val base = math.max(
      docs.filter(col("y_b")).count().toDouble,
      docs.filter(!col("y_b")).count().toDouble) / n
    // full-batch GD on hashed BoW must beat majority-class on train data
    assert(correct / n > base,
      s"train accuracy ${correct / n} vs majority baseline $base")
  }

  test("null text scores null (not a silent 0.5); empty text scores 0.5") {
    import spark.implicits._
    graft.functions.Functions.ensure(spark)
    val w = Array.fill(16)(0.3)
    val got = Seq((1L, "some text"), (2L, null), (3L, "  "))
      .toDF("id", "text")
      .select(col("id"), QualityModel.score(col("text"), w, 16).as("p"))
      .collect().map(r => r.getLong(0) -> Option(if (r.isNullAt(1)) null else r.getDouble(1))).toMap
    assert(got(1L).exists(_.asInstanceOf[Double] > 0.5))
    assert(got(2L).isEmpty, "null text must score null")
    assert(got(3L).contains(0.5), "token-less text is margin 0")
  }

  test("weights round-trip through parquet; loaded model scores identically") {
    import spark.implicits._
    val w = QualityModel.train(docs, "doc_id", "text", "y_b", dim = 128, iters = 2)
    val dir = java.nio.file.Files.createTempDirectory("graft-qm-save").toString
    QualityModel.saveWeights(spark, w, dir)
    val loaded = QualityModel.loadWeights(spark, dir)
    assert(loaded.toSeq === w.toSeq)
    val a = docs.select(col("doc_id"), QualityModel.score(col("text"), w, 128))
      .as[(Long, Double)].collect().toMap
    val b = docs.select(col("doc_id"), QualityModel.score(col("text"), loaded, 128))
      .as[(Long, Double)].collect().toMap
    assert(a === b)
  }

  test("scoring fold reproduces the training-time probability") {
    import spark.implicits._
    val dim = 256
    val w = QualityModel.train(docs, "doc_id", "text", "y_b", dim = dim, iters = 2)
    val wFp = w.map(x =>
      BigDecimal(x * graft.operators.Similarity.fixedPointScale)
        .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLong)
    val got = docs.limit(50)
      .select(col("doc_id"), QualityModel.score(col("text"), w, dim).as("p"))
      .as[(Long, Double)].collect().toMap
    val want = docs.limit(50).select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().map { case (id, text) =>
        val fs = text.toLowerCase(java.util.Locale.ROOT)
          .split("\\s+").toSeq.filter(_.nonEmpty)
          .map { wd =>
            val h = graft.functions.CassandraMurmur3.hashString(wd, 0x9e37L)
            (((h % dim) + dim) % dim).toInt
          }.distinct
        val mfp = fs.iterator.map(wFp(_)).sum
        val margin =
          if (fs.nonEmpty)
            mfp.toDouble / graft.operators.Similarity.fixedPointScale /
              math.sqrt(fs.length.toDouble)
          else 0.0
        id -> 1.0 / (1.0 + StrictMath.exp(-margin))
      }.toMap
    assert(got === want)
  }
}
