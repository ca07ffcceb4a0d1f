package graft.tools

import graft.{GraftSession, SparkEntry}

/** Dev tool: time a comma-separated subset of SparkEntry.queries with the
  * bench methodology (per-query warm pass, then three timed noop-sink runs,
  * min reported) — the optimization inner loop without the full headline
  * pass. Not part of the driver contract; BENCH_r*.json stays the record.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val names =
      if (args.nonEmpty) args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else graft.Bench.headline
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.get("graft-time-queries")
    names.foreach { name =>
      SparkEntry.queries(name)(spark, sfDir).write
        .format("noop").mode("overwrite").save()
    }
    names.foreach { name =>
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).write
          .format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIME $name%-28s min ${times.min}%.3f  runs ${times.map(t => f"$t%.3f").mkString(" ")}")
    }
    spark.stop()
  }
}
