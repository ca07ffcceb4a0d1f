package graft.tools

import graft.{GraftSession, SparkEntry}

/** Prints formatted physical plans for the headline queries so pushdown,
  * pruning, broadcast and codegen spans can be audited (and regressions
  * spotted by diffing the output across rounds).
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.get("graft-plan-audit")
    val names = if (args.nonEmpty) args.toSeq else graft.Bench.headline
    names.foreach { name =>
      println(s"\n========== $name ==========")
      val df = SparkEntry.queries(name)(spark, sfDir)
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
