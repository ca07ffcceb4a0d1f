package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver's parquet tables (TESTDATA.md).
  *
  * All reads go through `spark.read.parquet` so Catalyst's column pruning and
  * predicate pushdown reach the parquet footers; never collect-and-rebuild.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Spread a narrow scan across the cluster before compute-heavy map
    * stages. Single-row-group parquet files read as ONE split, which would
    * serialize shingle/sketch/regex work on one core; at production scale
    * inputs arrive in many splits and this is a no-op (the repartition only
    * fires when the scan has fewer partitions than the session's
    * parallelism).
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** `events.ts` has shipped in two physical forms across driver testdata
    * generations: parquet TIMESTAMP(NANOS) (which Spark reads as long NANOS
    * under `spark.sql.legacy.parquet.nanosAsLong`) and plain micros
    * TIMESTAMP / TIMESTAMP_NTZ. Any epoch arithmetic hardcoding one form
    * breaks analysis when the data is regenerated in the other (this zeroed
    * round 8's oracle gate) — so every `ts` consumer derives epoch numbers
    * through these schema-adaptive helpers. The session time zone is UTC,
    * making the NTZ→TZ cast instant-preserving.
    */
  def tsEpochUs(df: DataFrame, name: String = "ts"): Column = {
    import org.apache.spark.sql.functions.expr
    df.schema(name).dataType match {
      case LongType          => expr(s"$name div 1000")
      case TimestampType     => expr(s"unix_micros($name)")
      case TimestampNTZType  => expr(s"unix_micros(cast($name as timestamp))")
      case other => throw unexpectedTsType(name, other)
    }
  }

  /** Epoch milliseconds from `ts`, schema-adaptive (see [[tsEpochUs]]). */
  def tsEpochMs(df: DataFrame, name: String = "ts"): Column = {
    import org.apache.spark.sql.functions.expr
    df.schema(name).dataType match {
      case LongType          => expr(s"$name div 1000000")
      case TimestampType     => expr(s"unix_micros($name) div 1000")
      case TimestampNTZType  => expr(s"unix_micros(cast($name as timestamp)) div 1000")
      case other => throw unexpectedTsType(name, other)
    }
  }

  /** `ts` as a session-zone TimestampType column (for watermarks/windows),
    * schema-adaptive (see [[tsEpochUs]]).
    */
  def tsAsTimestamp(df: DataFrame, name: String = "ts"): Column = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    df.schema(name).dataType match {
      case LongType          => timestamp_micros(expr(s"$name div 1000"))
      case TimestampType     => col(name)
      case TimestampNTZType  => col(name).cast(TimestampType)
      case other => throw unexpectedTsType(name, other)
    }
  }

  private def unexpectedTsType(name: String, got: DataType) =
    new IllegalArgumentException(
      s"column '$name': expected long (nanos), timestamp, or timestamp_ntz " +
        s"but the parquet schema carries ${got.catalogString} — the driver " +
        "testdata layout changed again; teach Tables.tsEpochUs the new form")

  def lineitem(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = apply(spark, dir, "embeddings")
}
