package graft

import graft.streaming.MutationStream
import org.apache.spark.sql.functions._

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  /** File stream sources need a directory of log segments. */
  lazy val logDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-events-log")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("segment-000.parquet"))
    dir.toString
  }

  test("windowed counts over the CDC stream match the batch aggregate") {
    val stream = MutationStream.eventStream(spark, logDir)
    val q = MutationStream.windowedCounts(stream)
      .writeStream.outputMode("complete")
      .format("memory").queryName("win_counts")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT event_type, sum(n) AS n FROM win_counts GROUP BY event_type")
        .as[(String, Long)].collect().toMap
      val batch = Tables.events(spark, sf).groupBy("event_type").count()
        .as[(String, Long)].collect().toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("materialized-view maintenance upserts LWW-compacted batches") {
    var total = 0L
    val stream = MutationStream.eventStream(spark, logDir)
    val q = MutationStream.maintainView(stream, Seq("user_id"),
      (batch, _) => total += batch.count()).start()
    try {
      q.processAllAvailable()
      // each micro-batch compacts to <= 1 row per user (15 users at sf0.001);
      // with maxFilesPerTrigger the log replays in >=1 batches
      assert(total >= 1)
      val users = Tables.events(spark, sf).select("user_id").distinct().count()
      assert(total <= users * 10, "per-batch compaction bounded by users x batches")
    } finally q.stop()
  }

  test("streaming LWW dedup emits at most one row per key") {
    val stream = MutationStream.eventStream(spark, logDir)
    val q = MutationStream.lwwStream(stream)
      .writeStream.outputMode("append")
      .format("memory").queryName("lww_out")
      .start()
    try {
      q.processAllAvailable()
      val out = spark.sql("SELECT user_id, event_type, count(*) c FROM lww_out GROUP BY 1,2")
      assert(out.filter(col("c") > 1).count() === 0)
    } finally q.stop()
  }
}
