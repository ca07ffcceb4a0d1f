package graft

import graft.operators.{CqlOps, WebCuration}
import org.apache.spark.sql.functions._

class WebCurationSpec extends SparkSpec {
  import spark.implicits._

  test("extractUrls finds every scheme'd URL in document order") {
    val df = Seq(
      (1L, "see https://a.example.com/x then http://b.org/y?q=1 done"),
      (2L, "no urls here")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"), WebCuration.extractUrls(col("text")).as("u"))
      .as[(Long, Seq[String])].collect().sortBy(_._1)
    assert(got(0)._2 === Seq("https://a.example.com/x", "http://b.org/y?q=1"))
    assert(got(1)._2 === Seq.empty)
  }

  test("hostOf and domainOf normalize authority and strip www") {
    val df = Seq(
      "https://www.example.com/path/x",
      "http://sub.example.org",
      "https://example.net/?q=www.other.com").toDF("url")
    val got = df.select(WebCuration.domainOf(WebCuration.hostOf(col("url"))))
      .as[String].collect().toSeq
    assert(got === Seq("example.com", "sub.example.org", "example.net"))
  }

  test("capPerDomain matches the rank-window form and bounds every domain") {
    graft.functions.Functions.ensure(spark)
    val docs = spark.range(200).select(
      col("id").as("doc_id"),
      concat(lit("d"), (col("id") % 7).cast("string")).as("domain"))
    val capped = WebCuration.capPerDomain(docs, "domain", "doc_id", 5)
    val sizes = capped.groupBy("domain").count().as[(String, Long)].collect()
    assert(sizes.length === 7 && sizes.forall(_._2 === 5L))
    // same survivors + ranks as the window form over the same variate
    val m = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10).cast("long")
    val win = CqlOps.perPartitionLimit(
      docs.withColumn("_m", m), Seq("domain"), Seq(col("_m"), col("doc_id")), 5)
      .select(col("domain"), col("doc_id"), col("rn"))
    val a = capped.select("domain", "doc_id", "rn").as[(String, Long, Int)]
      .collect().sortBy(r => (r._1, r._3))
    val b = win.as[(String, Long, Int)].collect().sortBy(r => (r._1, r._3))
    assert(a.toSeq === b.toSeq)
  }

  test("capPerDomain keeps domains smaller than the cap whole") {
    graft.functions.Functions.ensure(spark)
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "domain")
    val got = WebCuration.capPerDomain(docs, "domain", "doc_id", 10)
      .select("domain", "doc_id").as[(String, Long)].collect().toSet
    assert(got === Set(("a", 1L), ("a", 2L), ("b", 3L)))
  }

  test("q_web_e2e: per-domain counts respect the cap; the DAG plans the " +
      "bounded aggregate and no rank window") {
    val df = Queries.byName("q_web_e2e").impl(spark, sf)
    val rows = df.as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (dom, n, chars, first) =>
      assert(n >= 1L && n <= 10L, s"$dom kept $n docs")
      assert(chars > 0L && first >= 0L)
    }
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "cap must not plan a rank window")
    assert(plan.contains("ObjectHashAggregate"), "cap should use TopKRowsAgg")
  }

  test("q_domain_cap plans the bounded aggregate, not a rank window") {
    val df = Queries.byName("q_domain_cap").impl(spark, sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "cap must not plan a rank window")
    assert(plan.contains("ObjectHashAggregate"), "cap should use TopKRowsAgg")
  }
}
