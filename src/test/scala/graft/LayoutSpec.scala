package graft

import graft.operators.Layout
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Proof that the token-bucketed layout removes shuffles: the same
  * aggregation/join that exchanges on a plain parquet read runs
  * exchange-free on the bucketed table.
  */
class LayoutSpec extends SparkSpec {

  def explainOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  lazy val setup: Unit = {
    // a previous JVM's managed-table locations survive in spark-warehouse/
    // while the in-memory catalog does not — clear both
    Seq("li_bucketed", "ord_bucketed").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }
    val li = Tables.lineitem(spark, sf)
    Layout.writeBucketed(li, "li_bucketed", Seq("l_orderkey"), Seq("l_orderkey", "l_linenumber"), 8)
    val ord = Tables.orders(spark, sf)
    Layout.writeBucketed(ord, "ord_bucketed", Seq("o_orderkey"), Seq("o_orderkey"), 8)
  }

  test("group-by on the bucket key needs no Exchange") {
    setup
    val plain = Tables.lineitem(spark, sf)
      .groupBy("l_orderkey").agg(sum("l_quantity"))
    assert(explainOf(plain).contains("Exchange"))

    val bucketed = Layout.readBucketed(spark, "li_bucketed")
      .groupBy("l_orderkey").agg(sum("l_quantity"))
    assert(!explainOf(bucketed).contains("Exchange"),
      explainOf(bucketed))
  }

  test("fact-fact join on the bucket key needs no Exchange") {
    setup
    val li = Layout.readBucketed(spark, "li_bucketed")
    val ord = Layout.readBucketed(spark, "ord_bucketed")
    val joined = li.join(ord.hint("merge"), col("l_orderkey") === col("o_orderkey"))
    val p = explainOf(joined)
    assert(!p.contains("Exchange hashpartitioning"), p)
  }

  test("bucketed results equal plain results") {
    setup
    val a = Tables.lineitem(spark, sf).groupBy("l_orderkey")
      .agg(sum("l_quantity").as("q")).collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val b = Layout.readBucketed(spark, "li_bucketed").groupBy("l_orderkey")
      .agg(sum("l_quantity").as("q")).collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(a === b)
  }
}
