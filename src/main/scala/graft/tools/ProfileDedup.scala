package graft.tools

import graft._
import graft.operators._
import org.apache.spark.sql.functions._

/** Stage-by-stage timings for the MinHash+LSH pipeline at
  * SPARK_GRAFT_SF_DIR — the breakdown behind SCALE.md's dedup notes.
  * Two iterations: the first includes codegen/scan warmup, read the second.
  */
object ProfileDedup {
  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime; val r = f
    println(f"PROFILE $label: ${(System.nanoTime - t0) / 1e9}%.3f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("profile-dedup")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = Tables(spark, d, "documents")
    println("PROFILE docs rows: " + docs.count())
    for (_ <- 1 to 2) {
      val docsS = Tables.spread(docs)
      val sh = Dedup.explodedShingles(docsS, "doc_id", "text", 5)
      time("shingle-explode")(sh.count())
      val sigs = Dedup.minhashSignatures(sh, 64)
      time("signatures")(sigs.agg(sum(element_at(col("sig"), 1))).collect())
      val cands = Dedup.lshCandidates(Dedup.lshBuckets(sigs, 16, 4))
      println("PROFILE cands rows: " + time("candidates")(cands.count()))
      time("full-query")(Queries.byName("q_dedup_minhash_lsh").impl(spark, d).collect())
    }
    spark.stop()
  }
}
