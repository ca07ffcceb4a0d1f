package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL document ingestion — the other half of the crawl entry point
  * beside [[WebArchive]]: schema-conformed reads with a corrupt-record
  * QUARANTINE instead of silent drops, and deterministic document ids.
  *
  * Scale notes: JSONL is newline-split (free parallelism, like the WARC
  * delimiter trick); quarantining rides Spark's PERMISSIVE mode so the
  * good-path scan stays a plain pushdown-friendly json read; ids derive
  * from content/url hashes (64-bit murmur), so re-runs, backfills, and
  * cross-cluster runs agree without sequence coordination —
  * `monotonically_increasing_id` is partition-layout-dependent and would
  * break every downstream join the moment the input re-splits.
  */
object DocumentIngest {

  /** Read JSONL under `path` against `schema`. Returns (good, quarantine):
    * good rows are records that parse as JSON (fields absent from the
    * record or failing type coercion read as null — standard PERMISSIVE
    * semantics); quarantine carries the RAW line of every record that is
    * not JSON at all, so the drop is auditable and replayable — a 100 TB
    * crawl ingest that silently discards malformed lines cannot be
    * debugged after the fact.
    *
    * Formulated as a text scan + `from_json` rather than the json reader's
    * `_corrupt_record` column: Spark refuses plans whose projection prunes
    * to only the corrupt column, which is exactly what a quarantine sink
    * does; `from_json` has no such restriction and keeps both branches as
    * plain projections over the same splittable line scan.
    */
  def jsonl(spark: SparkSession, path: String,
            schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains("_corrupt_record"),
      "schema must not predeclare _corrupt_record")
    // from_json's own corrupt-record column is the discriminator —
    // PERMISSIVE from_json returns an all-null struct (not a null) for
    // malformed input, so struct nullness alone cannot tell a bad line
    // from a parseable '{}'
    val withCorrupt = StructType(schema.fields :+
      StructField("_corrupt_record", StringType))
    val parsed = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
      .select(col("value"),
        from_json(col("value"), withCorrupt,
          Map("mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> "_corrupt_record")).as("p"))
    val good = parsed.filter(col("p._corrupt_record").isNull)
      .select("p.*").drop("_corrupt_record")
    val quarantine = parsed.filter(col("p._corrupt_record").isNotNull)
      .select(col("value").as("raw_line"))
    (good, quarantine)
  }

  /** CSV twin of [[jsonl]]: same split/quarantine contract through
    * `from_csv`. Header handling stays distributed — pass the known header
    * text as `headerLine` and it filters as a plain predicate on the line
    * scan (no per-file driver pass, no split-order dependence); rows that
    * fail type coercion land in quarantine with the raw line.
    */
  def csv(spark: SparkSession, path: String, schema: StructType,
          delimiter: String = ",",
          headerLine: Option[String] = None): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains("_corrupt_record"),
      "schema must not predeclare _corrupt_record")
    val withCorrupt = StructType(schema.fields :+
      StructField("_corrupt_record", StringType))
    val lines0 = spark.read.text(path)
      .filter(length(trim(col("value"))) > 0)
    val lines = headerLine.fold(lines0)(h => lines0.filter(col("value") =!= h))
    val parsed = lines.select(col("value"),
      from_csv(col("value"), withCorrupt,
        Map("mode" -> "PERMISSIVE", "sep" -> delimiter,
          "columnNameOfCorruptRecord" -> "_corrupt_record")).as("p"))
    val good = parsed.filter(col("p._corrupt_record").isNull)
      .select("p.*").drop("_corrupt_record")
    val quarantine = parsed.filter(col("p._corrupt_record").isNotNull)
      .select(col("value").as("raw_line"))
    (good, quarantine)
  }

  /** Deterministic 63-bit nonnegative document id from a key column
    * (url, content digest, ...): murmur64 masked to Long.MaxValue.
    * Collision odds ~n²/2^64 — negligible against crawl-scale corpora's
    * own url dup rate; for content ids pass `md5(text)` as the key.
    */
  def stableId(key: Column, seed: Long = 0x9e3779b9L): Column =
    graft.functions.Functions.murmur64(key.cast("string"), lit(seed))
      .bitwiseAND(lit(Long.MaxValue))
}
