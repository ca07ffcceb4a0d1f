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

  test("scan parallelism tracks parquet row-group count (SCALE.md §Layout " +
    "pinned as an executable fact)") {
    // The round driver has regenerated testdata as ONE row group per
    // table, serializing scans onto one task and producing bench numbers
    // that look like plan regressions. This pins the causal chain: same
    // bytes, same plan — task parallelism is decided by the file's
    // row-group count, which is an input-layout property, not a plan one.
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.hadoop.fs.{Path => HPath}

    val dir = java.nio.file.Files.createTempDirectory("graft-rowgroups")
    val rows = 2000000L
    val df = spark.range(0L, rows, 1L, 1)
      .selectExpr("id % 1000 AS k", "CAST(id AS DOUBLE) * 1.5 AS v")

    // same data, one file each: many small row groups vs one big one
    df.coalesce(1).write.option("parquet.block.size", 512 * 1024)
      .parquet(s"$dir/multi")
    df.coalesce(1).write.option("parquet.block.size", 1024 * 1024 * 1024)
      .parquet(s"$dir/single")

    def rowGroups(sub: String): Int = {
      val f = new java.io.File(s"$dir/$sub").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      val rd = ParquetFileReader.open(HadoopInputFile.fromPath(
        new HPath(f.getAbsolutePath), spark.sparkContext.hadoopConfiguration))
      try rd.getFooter.getBlocks.size finally rd.close()
    }
    val nMulti = rowGroups("multi")
    val nSingle = rowGroups("single")
    assert(nMulti > 4, s"expected many row groups, got $nMulti")
    assert(nSingle === 1)

    // count the tasks that actually produce rows: Spark makes byte-range
    // splits regardless of layout, but a row group is consumed entirely by
    // the split holding its midpoint — so row groups, not split count,
    // bound scan parallelism
    val savedMax = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", (256 * 1024).toString)
    try {
      def tasksWithRows(sub: String): Long =
        spark.read.parquet(s"$dir/$sub")
          .groupBy(spark_partition_id().as("pid")).count().count()
      assert(tasksWithRows("single") === 1L,
        "a single-row-group file must serialize onto one task no matter how many splits exist")
      assert(tasksWithRows("multi") === nMulti.toLong,
        s"a $nMulti-row-group file must fan out to $nMulti tasks")

      // and the parallelism is real wall-clock, not bookkeeping: the same
      // scan-fused aggregation over the same bytes scales down when row
      // groups fan out. The per-row payload is deliberately compute-heavy
      // (sha2) so the parallelism gain dwarfs per-task scheduling overhead
      // and machine noise — a cheap sum over 2M rows finishes so fast that
      // the fan-out's task overhead can win, making the comparison flaky.
      def timeAgg(sub: String): Double = {
        val t = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          spark.read.parquet(s"$dir/$sub").groupBy("k")
            .agg(sum(length(sha2(concat_ws(":", col("k"), col("v")), 256))))
            .write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        t.min
      }
      val tSingle = timeAgg("single")
      val tMulti = timeAgg("multi")
      assert(tMulti < tSingle,
        f"multi-row-group scan ($tMulti%.3f s) should beat the serialized single-group scan ($tSingle%.3f s)")
    } finally spark.conf.set("spark.sql.files.maxPartitionBytes", savedMax)
  }

  test("bucketed results equal plain results") {
    setup
    val a = Tables.lineitem(spark, sf).groupBy("l_orderkey")
      .agg(sum("l_quantity").as("q")).collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val b = Layout.readBucketed(spark, "li_bucketed").groupBy("l_orderkey")
      .agg(sum("l_quantity").as("q")).collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(a === b)
  }

  test("z-order layout: a second-dimension box predicate prunes to fewer " +
    "files than a leading-column sort (real footer min/max statistics)") {
    graft.functions.Functions.ensure(spark)
    val li = Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_partkey", "l_suppkey")
    val zdir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    val ndir = java.nio.file.Files.createTempDirectory("graft-zorder-naive").toString
    Layout.zorderRepartition(li, col("l_partkey"), col("l_suppkey"), 16, 16)
      .write.mode("overwrite").parquet(zdir)
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(ndir)
    // per-FILE min/max of the second dimension — what parquet footer
    // pruning sees; a file overlapping the box must be read
    def overlapping(dir: String, lo: Long, hi: Long): (Int, Int) = {
      val st = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min("l_suppkey").as("s0"), max("l_suppkey").as("s1"))
        .collect()
      (st.count(r => r.getLong(1) <= hi && r.getLong(2) >= lo), st.length)
    }
    val sMax = li.agg(max("l_suppkey")).head().getLong(0)
    val (lo, hi) = (sMax / 4, sMax / 2) // a quarter-domain box on dim 2
    val (zHit, zTotal) = overlapping(zdir, lo, hi)
    val (nHit, nTotal) = overlapping(ndir, lo, hi)
    // the leading-column sort leaves suppkey unclustered: essentially
    // every file spans the domain and must be read
    assert(nHit >= nTotal - 1, s"naive layout should not prune dim 2 ($nHit/$nTotal)")
    // z-order clusters BOTH dimensions: the quarter-box touches a strict
    // subset of the files
    assert(zHit < nHit && zHit < zTotal,
      s"z-order must prune dim-2 boxes: $zHit/$zTotal vs naive $nHit/$nTotal")
    // layout never changes results
    assert(spark.read.parquet(zdir).count() === li.count())
  }

  test("3-d z-order layout: box predicates on the SECOND and THIRD " +
    "dimensions both prune to fewer files than the leading-column sort; " +
    "the kernel interleaves all three dimensions' bits") {
    // kernel sanity on the generalized interleave: stride-3 bit layout
    assert(graft.functions.ZOrder.spread(0x7L, 3, 3, 0) === 0x49L) // 1001001b
    assert(graft.functions.ZOrder.spread(0x7L, 3, 3, 2) === 0x124L)
    // N=2 layout unchanged (the q_zorder oracle depends on it)
    assert(graft.functions.ZOrder.interleave(5L, 3L, 3) ===
      (graft.functions.ZOrder.spread(5L, 3, 2, 0) |
        graft.functions.ZOrder.spread(3L, 3, 2, 1)))

    val li = Tables(spark, sf, "lineitem")
      .select("l_partkey", "l_suppkey", "l_linenumber")
    val zdir = java.nio.file.Files.createTempDirectory("graft-zorder3").toString
    val ndir = java.nio.file.Files.createTempDirectory("graft-zorder3-naive").toString
    Layout.zorderRepartitionN(li,
        Seq(col("l_partkey"), col("l_suppkey"), col("l_linenumber")), 10, 16)
      .write.mode("overwrite").parquet(zdir)
    li.repartitionByRange(16, col("l_partkey"))
      .sortWithinPartitions("l_partkey")
      .write.mode("overwrite").parquet(ndir)
    def overlapping(dir: String, dim: String, lo: Long, hi: Long): (Int, Int) = {
      val st = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min(dim).cast("long").as("s0"), max(dim).cast("long").as("s1"))
        .collect()
      (st.count(r => r.getLong(1) <= hi && r.getLong(2) >= lo), st.length)
    }
    val sMax = li.agg(max("l_suppkey")).head().getLong(0)
    val (zHit2, zTotal) = overlapping(zdir, "l_suppkey", sMax / 4, sMax / 2)
    val (nHit2, nTotal) = overlapping(ndir, "l_suppkey", sMax / 4, sMax / 2)
    assert(nHit2 >= nTotal - 1, s"naive layout should not prune dim 2 ($nHit2/$nTotal)")
    assert(zHit2 < nHit2 && zHit2 < zTotal,
      s"3-d z-order must prune dim-2 boxes: $zHit2/$zTotal vs naive $nHit2/$nTotal")
    // third dimension (l_linenumber spans 1..7): a single-value box
    val (zHit3, _) = overlapping(zdir, "l_linenumber", 1L, 1L)
    val (nHit3, _) = overlapping(ndir, "l_linenumber", 1L, 1L)
    assert(nHit3 >= nTotal - 1, s"naive layout should not prune dim 3 ($nHit3/$nTotal)")
    assert(zHit3 < nHit3,
      s"3-d z-order must prune dim-3 boxes: $zHit3/$zTotal vs naive $nHit3/$nTotal")
    assert(spark.read.parquet(zdir).count() === li.count())
  }
}
