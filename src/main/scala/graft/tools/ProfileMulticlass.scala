package graft.tools

import graft._
import graft.operators._
import org.apache.spark.sql.functions._

/** Dev tool: stage timings for the q_multiclass_model path (train vs
  * scoring) at SPARK_GRAFT_SF_DIR. Two passes; read the second.
  */
object ProfileMulticlass {
  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime; val r = f
    println(f"PROFILE $label: ${(System.nanoTime - t0) / 1e9}%.3f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("profile-multiclass")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (i <- 1 to 2) {
      println(s"=== pass $i")
      val docs = Tables.spread(Tables(spark, d, "documents"))
        .filter(col("text").isNotNull)
        .withColumn("label", concat(lit("c"), (col("doc_id") % 3).cast("string")))
        .withColumn("ptext", concat(col("text"), lit(" mk"),
          (col("doc_id") % 3).cast("string")))
      val m = time("train")(MulticlassModel.train(docs, "doc_id", "ptext",
        "label", dim = 512, iters = 12))
      val ps = MulticlassModel.scores(col("ptext"), m)
      time("score+noop") {
        docs.select(col("doc_id"),
            MulticlassModel.predict(col("ptext"), m).as("pred"),
            round(element_at(ps, 1), 6).as("p0"),
            round(element_at(ps, 2), 6).as("p1"),
            round(element_at(ps, 3), 6).as("p2"))
          .orderBy("doc_id")
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
