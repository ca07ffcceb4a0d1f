package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Physical layout management: the Spark analog of the reference's
  * token-ring data placement (`dht/Murmur3Partitioner.java`,
  * `locator/`).
  *
  * A table bucketed+sorted by its partition key gives Spark the same two
  * properties the reference gets from its ring + clustering layout:
  *  - joins/aggregations on the partition key need NO shuffle (bucket
  *    co-location = replica co-location);
  *  - clustering-ordered in-bucket files make slice scans sequential.
  *
  * At 100 TB this is the difference between an engine that re-shuffles the
  * fact table on every query and one that reads it in place. [[LayoutSpec]]
  * proves the Exchange disappears.
  */
object Layout {

  /** Write a DataFrame as a bucketed, per-bucket-sorted managed table. */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    sortCols: Seq[String], numBuckets: Int,
                    mode: SaveMode = SaveMode.Overwrite): Unit = {
    df.write
      .mode(mode)
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(sortCols.head, sortCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Load a bucketed table (bucket metadata flows from the catalog). */
  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Z-ORDER clustering (the Delta `OPTIMIZE ZORDER BY` / Hudi / Iceberg
    * layout move): range-partition + sort by the Morton interleaving of
    * N dimensions ([[graft.functions.ZValueN]]), so each written file
    * covers a small BOX in the N-d space and per-file min/max statistics
    * prune N-d box predicates — a single-column sort clusters only its
    * leading column, leaving every other dimension's min/max spanning
    * the whole domain in every file. One range shuffle, exactly what a
    * plain global sort costs; the clustering is free at write time.
    * Real layout tuning takes 3-4 dimensions (Delta caps ZORDER at a
    * handful for the same bits-budget reason: bits × N ≤ 63 here).
    * LayoutSpec demonstrates the pruning win against footer statistics.
    */
  def zorderRepartition(df: DataFrame, a: org.apache.spark.sql.Column,
                        b: org.apache.spark.sql.Column, bits: Int,
                        numPartitions: Int): DataFrame =
    zorderRepartitionN(df, Seq(a, b), bits, numPartitions)

  /** N-dimensional [[zorderRepartition]] (2 ≤ dims, bits × dims ≤ 63). */
  def zorderRepartitionN(df: DataFrame,
                         dims: Seq[org.apache.spark.sql.Column], bits: Int,
                         numPartitions: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    require(dims.length >= 2, s"zorder needs >= 2 dimensions, got ${dims.length}")
    require(bits >= 1 && bits * dims.length <= 63,
      s"zorder needs bits*dims <= 63, got bits=$bits dims=${dims.length}")
    // Range-normalize EVERY dimension to the same `bits` width first (the
    // Delta/Iceberg move): interleaving raw values lets the wider-domain
    // column's high bits dominate the curve and the layout degenerates to
    // a single-column sort — e.g. a 4-bit dim interleaved with a 16-bit
    // dim clusters only the 16-bit one. The min/max header is one
    // 2N-value driver aggregate; layout choices never affect results,
    // only which files a predicate has to read.
    val aggs = dims.flatMap(c => Seq(min(c).cast("double"), max(c).cast("double")))
      .zipWithIndex.map { case (c, i) => c.as(s"_m$i") }
    val mm = df.agg(aggs.head, aggs.tail: _*).head()
    val top = (1L << bits) - 1
    def norm(c: org.apache.spark.sql.Column, lo: Double, hi: Double) =
      if (hi > lo)
        floor((c.cast("double") - lit(lo)) * lit(top.toDouble) / lit(hi - lo))
          .cast("long")
      else lit(0L)
    val normed = dims.zipWithIndex.map { case (c, k) =>
      norm(c, mm.getDouble(2 * k), mm.getDouble(2 * k + 1))
    }
    val z = call_function("z_value", normed :+ lit(bits): _*)
    df.withColumn("_z", z)
      .repartitionByRange(numPartitions, col("_z"))
      .sortWithinPartitions("_z")
      .drop("_z")
  }
}
