package graft.tools

/** Dev tool: dump a comma-separated subset of SparkEntry.queries at an
  * arbitrary SF for a local DuckDB spot-check (oracle SQL comes from a
  * prior full Verify dump's oracle_sql.json). Caught a real one: the
  * boilerplate oracle's empty-list array_to_string NULL only shows at
  * sf0.1, where some doc drops every line. Not part of the driver
  * contract.
  */
object VerifySubset {
  def main(args: Array[String]): Unit = {
    val Array(names, sfDir, outDir) = args
    val spark = graft.GraftSession.get("graft-verify-subset")
    names.split(",").foreach { n =>
      graft.SparkEntry.queries(n)(spark, sfDir)
        .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$n")
      println(s"[subset] dumped $n")
    }
    spark.stop()
  }
}
