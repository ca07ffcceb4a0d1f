package graft

import graft.operators.MulticlassModel
import org.apache.spark.sql.functions._

/** Multiclass softmax classifier: learnability on a separable corpus,
  * bit-determinism under repartitioning, artifact round-trip, and the
  * null/edge contracts.
  */
class MulticlassModelSpec extends SparkSpec {

  import spark.implicits._

  /** Separable 3-class corpus: each class carries marker words the others
    * never use, over a shared background vocabulary.
    */
  private def corpus(n: Int): org.apache.spark.sql.DataFrame = {
    val bg = Seq("data", "table", "scan", "row", "value", "fast")
    val markers = Map(
      "news" -> Seq("election", "minister", "press"),
      "code" -> Seq("compile", "pointer", "lambda"),
      "chat" -> Seq("lol", "brb", "omg"))
    val rnd = new scala.util.Random(41)
    (0 until n).map { i =>
      val cls = Seq("news", "code", "chat")(i % 3)
      val words = (0 until 12).map(_ => bg(rnd.nextInt(bg.size))) ++
        (0 until 3).map(_ => markers(cls)(rnd.nextInt(3)))
      (i.toLong, rnd.shuffle(words).mkString(" "), cls)
    }.toDF("doc_id", "text", "label")
  }

  test("the local driver fold is bit-equal to the distributed softmax GD " +
    "loop (size-adaptive switch never changes a weight)") {
    graft.functions.Functions.ensure(spark)
    val docs = corpus(120)
    val mLocal = MulticlassModel.train(docs, "doc_id", "text", "label",
      dim = 128, iters = 3)
    spark.conf.set("spark.graft.train.localIterMaxRows", "0")
    try {
      val mDist = MulticlassModel.train(docs, "doc_id", "text", "label",
        dim = 128, iters = 3)
      assert(mLocal.classes === mDist.classes)
      assert(mLocal.weights.map(_.toSeq).toSeq === mDist.weights.map(_.toSeq).toSeq)
    } finally spark.conf.unset("spark.graft.train.localIterMaxRows")
  }

  test("learns a separable 3-class corpus to high accuracy; probabilities " +
    "sum to 1 in class order") {
    graft.functions.Functions.ensure(spark)
    val docs = corpus(240)
    val m = MulticlassModel.train(docs, "doc_id", "text", "label",
      dim = 256, iters = 16)
    assert(m.classes === Seq("chat", "code", "news")) // sorted
    val scored = docs.select(col("label"),
      MulticlassModel.predict(col("text"), m).as("pred"),
      MulticlassModel.scores(col("text"), m).as("ps"))
    val acc = scored.filter(col("pred") === col("label")).count().toDouble /
      docs.count()
    assert(acc >= 0.95, s"accuracy $acc on a separable corpus")
    // softmax rows sum to 1 and argmax(ps) agrees with predict
    scored.collect().foreach { r =>
      val ps = r.getSeq[Double](2)
      assert(math.abs(ps.sum - 1.0) < 1e-9)
      assert(m.classes(ps.indexOf(ps.max)) === r.getString(1))
    }
  }

  test("training is bit-deterministic under repartitioning; the artifact " +
    "round-trips") {
    graft.functions.Functions.ensure(spark)
    val docs = corpus(120)
    val m1 = MulticlassModel.train(docs, "doc_id", "text", "label",
      dim = 128, iters = 6)
    val m2 = MulticlassModel.train(docs.repartition(13), "doc_id", "text", "label",
      dim = 128, iters = 6)
    assert(m1.classes === m2.classes)
    (m1.weights, m2.weights).zipped.foreach { (a, b) =>
      assert(a.toSeq === b.toSeq, "fixed-point training must not depend on partitioning")
    }
    val dir = java.nio.file.Files.createTempDirectory("graft-mcm").toString
    MulticlassModel.save(spark, m1, dir)
    val m3 = MulticlassModel.load(spark, dir)
    assert(m3.classes === m1.classes && m3.dim === m1.dim)
    (m3.weights, m1.weights).zipped.foreach((a, b) => assert(a.toSeq === b.toSeq))
  }

  test("contracts: null/token-less text predicts null; unlabeled rows " +
    "carry no gradient; < 2 classes rejects") {
    graft.functions.Functions.ensure(spark)
    val docs = corpus(90)
    val m = MulticlassModel.train(docs, "doc_id", "text", "label",
      dim = 128, iters = 4)
    val edge = Seq((1L, null.asInstanceOf[String]), (2L, "   "), (3L, "lol brb"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), MulticlassModel.predict(col("text"), m).as("p"))
      .collect().sortBy(_.getLong(0))
    assert(edge(0).isNullAt(1) && edge(1).isNullAt(1))
    assert(edge(2).getString(1) === "chat")
    // null labels are excluded from training, not crashed on
    val withNulls = docs.union(Seq((900L, "data table", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "label"))
    val m2 = MulticlassModel.train(withNulls, "doc_id", "text", "label",
      dim = 128, iters = 4)
    assert(m2.classes === m.classes)
    (m2.weights, m.weights).zipped.foreach((a, b) => assert(a.toSeq === b.toSeq))
    val e = intercept[IllegalArgumentException] {
      MulticlassModel.train(docs.filter(col("label") === "news"),
        "doc_id", "text", "label", dim = 64, iters = 1)
    }
    assert(e.getMessage.contains(">= 2 classes"))
  }
  test("classificationReport: hand-checked tp/fp/fn with abstentions and " +
    "a predicted-only class; macro is the fixed-point mean, micro pools") {
    graft.functions.Functions.ensure(spark)
    import spark.implicits._
    // truth: a,a,a,b,b ; preds: a,a,b,b,null ; plus one pred of a class
    // never true ("c" on a true "a")
    val pairs = Seq(
      ("a", Some("a")), ("a", Some("a")), ("a", Some("b")),
      ("b", Some("b")), ("b", None), ("a", Some("c")))
      .toDF("y", "pred")
    val got = MulticlassModel.classificationReport(pairs, "y", "pred")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5), r.getDouble(6), r.getDouble(7)))).toMap
    // a: support 4, tp 2, fp 0, fn 2 -> p 1.0, r 0.5, f1 = 2*1*0.5/1.5
    assert(got("a") === ((4L, 2L, 0L, 2L, 1.0, 0.5, 0.666667)))
    // b: support 2, tp 1, fp 1 (the a->b miss), fn 1 -> p 0.5, r 0.5, f1 0.5
    assert(got("b") === ((2L, 1L, 1L, 1L, 0.5, 0.5, 0.5)))
    // c: never true -> support 0, tp 0, fp 1, fn 0 -> all metrics 0
    assert(got("c") === ((0L, 0L, 1L, 0L, 0.0, 0.0, 0.0)))
    // macro: mean of rounded per-class metrics over 3 classes
    assert(got("__macro__")._5 === 0.5) // (1.0 + 0.5 + 0.0)/3
    assert(got("__macro__")._6 === 0.333333) // (0.5+0.5+0)/3
    assert(got("__macro__")._7 === 0.388889) // (0.666667+0.5+0)/3
    // micro: pooled tp 3, fp 2, fn 3 -> p 0.6, r 0.5, f1 2*.6*.5/1.1
    assert(got("__micro__") === ((6L, 3L, 2L, 3L, 0.6, 0.5, 0.545455)))
  }

}
