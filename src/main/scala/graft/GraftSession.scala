package graft

import org.apache.spark.sql.SparkSession

/** Canonical session factory for the graft engine.
  *
  * Defaults are tuned for the harness's local[32] single-JVM mode, but every
  * knob is the one we'd set on a real 1000-executor cluster too:
  *  - AQE on (runtime coalescing, skew-join splitting, runtime broadcast);
  *  - shuffle partitions sized to cores locally (on a cluster this is
  *    overridden by AQE's coalescing from an initial high value);
  *  - UTC session time zone for oracle parity.
  */
object GraftSession {
  def cpus: String = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .master(s"local[$cpus]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.filterPushdown", "true")
      // Driver testdata generations have shipped events.ts both as parquet
      // TIMESTAMP(NANOS) (unrepresentable in Spark; this flag reads it as
      // long nanos) and as a plain micros timestamp (flag is then a no-op).
      // Keep the flag so EITHER layout analyzes; all ts consumers go through
      // the schema-adaptive Tables.tsEpochUs/tsEpochMs/tsAsTimestamp.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // CQL semantics: fixed-width integer arithmetic wraps on overflow
      // (reference AggregateFcts.java sum(int) behavior; also required for
      // the wrapping 64-bit double-hashing in MinHash signatures)
      .config("spark.sql.ansi.enabled", "false")
      // CQL map put semantics: m + {k:v} overwrites existing keys
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      // the default 100-entry codegen cache thrashes across this library's
      // many generated plans (sketch aggregates, CQL folds, bucket joins),
      // forcing multi-second janino recompiles mid-benchmark
      .config("spark.sql.codegen.cache.maxEntries", "2000")
      // ObjectHashAggregate falls back to sort-based aggregation after 128
      // distinct groups per task — far too eager for the fixed-width
      // MinHash/SimHash/top-k sketch buffers (≤512 B each: 1024 groups ≈
      // 0.5 MB). The same knob governs variable-size states (the LSH
      // bucket collect_sets), where a single hot bucket's state dwarfs the
      // group-count term at ANY threshold — 1024 keeps the spill valve
      // within ~0.5 GB even if every resident group held ~512 KB of ids
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "1024")
      .withExtensions(new graft.functions.GraftExtensions)

  def get(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Functions.ensure(spark)
    spark
  }
}
