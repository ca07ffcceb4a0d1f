package graft

import graft.sources.DocumentIngest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class DocumentIngestSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("url", StringType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("jsonl: good rows conform, corrupt rows quarantine with the raw line") {
    val dir = java.nio.file.Files.createTempDirectory("graft-jsonl")
    java.nio.file.Files.writeString(dir.resolve("a.jsonl"),
      """{"url":"http://x/1","text":"first doc","lang":"en"}
        |{broken json line
        |{"url":"http://x/2","text":"second doc","lang":"de"}
        |""".stripMargin)
    val (good, quarantine) = DocumentIngest.jsonl(spark, s"$dir/a.jsonl", schema)
    assert(good.count() === 2)
    assert(good.columns.toSeq === Seq("url", "text", "lang"))
    val q = quarantine.collect().map(_.getString(0))
    assert(q.length === 1 && q.head.startsWith("{broken json"),
      "quarantine must carry the raw unparseable line")
  }

  test("csv: header filters distributed, bad type coercion quarantines") {
    val csvSchema = StructType(Seq(
      StructField("url", StringType),
      StructField("n_tokens", IntegerType)))
    val dir = java.nio.file.Files.createTempDirectory("graft-csv")
    java.nio.file.Files.writeString(dir.resolve("a.csv"),
      """url,n_tokens
        |http://x/1,42
        |http://x/2,notanint
        |http://x/3,7
        |""".stripMargin)
    val (good, quarantine) = DocumentIngest.csv(
      spark, s"$dir/a.csv", csvSchema, headerLine = Some("url,n_tokens"))
    val g = good.collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(g === Map("http://x/1" -> 42, "http://x/3" -> 7))
    val q = quarantine.collect().map(_.getString(0))
    assert(q.toSeq === Seq("http://x/2,notanint"))
  }

  test("stableId is deterministic across re-reads and partition layouts") {
    import spark.implicits._
    val docs = Seq("http://x/1", "http://x/2", "http://x/3").toDF("url")
    val a = docs.repartition(1)
      .select(col("url"), DocumentIngest.stableId(col("url")).as("id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = docs.repartition(7)
      .select(col("url"), DocumentIngest.stableId(col("url")).as("id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a === b, "ids must not depend on partitioning")
    assert(a.values.forall(_ >= 0L))
    assert(a.values.toSet.size === 3)
  }
}
