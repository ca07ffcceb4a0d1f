package graft.tools

import graft._
import graft.operators._
import org.apache.spark.sql.functions._

/** Dev tool: stage-by-stage timings of the q_host_pagerank path — edge
  * derivation vs the 10 synchronous iterations — at SPARK_GRAFT_SF_DIR.
  * Two passes; read the second (first includes codegen/scan warmup).
  */
object ProfilePagerank {
  private def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime; val r = f
    println(f"PROFILE $label: ${(System.nanoTime - t0) / 1e9}%.3f s"); r
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.get("profile-pagerank")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (i <- 1 to 2) {
      println(s"=== pass $i")
      val pages = time("plant-pages")(
        Queries.plantedLinkPagesForProfiling(spark, d).localCheckpoint())
      val edges = time("host-edges")(
        WebCuration.hostEdges(pages, "url", "links").localCheckpoint())
      val pr = time("pagerank-10-iters")(
        WebCuration.pageRank(edges, iters = 10))
      time("materialize")(
        pr.write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
