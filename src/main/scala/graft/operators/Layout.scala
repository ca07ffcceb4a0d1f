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
}
