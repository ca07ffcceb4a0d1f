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
      // events.parquet carries TIMESTAMP(NANOS) which Spark cannot represent;
      // read as long nanos (DuckDB oracles see the same instants in µs)
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
      // ObjectHashAggregate (sketch aggregates, collect_set buckets) falls
      // back to sort-based aggregation after 128 distinct groups per task —
      // far too eager for the fixed-width MinHash/SimHash/top-k buffers
      // (≤512 B each; 4096 groups ≈ 2 MB per task before safe fallback)
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "4096")
      .withExtensions(new graft.functions.GraftExtensions)

  def get(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Functions.ensure(spark)
    spark
  }
}
