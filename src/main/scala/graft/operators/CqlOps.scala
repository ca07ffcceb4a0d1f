package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CQL SELECT semantics re-expressed as Spark relational operators.
  *
  * Everything here is declarative DataFrame code — Catalyst handles pushdown,
  * pruning and codegen; nothing collects to the driver. Each helper cites the
  * reference behavior it models (file:line under /root/reference).
  */
object CqlOps {

  /** `PER PARTITION LIMIT n` (reference `db/filter/DataLimits.java:632-1041`):
    * first `n` rows of each partition in clustering order. The only Spark
    * construct with per-group early-out semantics is a rank window; at scale
    * this is one shuffle on the partition key (same cost as the reference's
    * per-partition iteration, which is free only because its storage is
    * already partition-clustered — with a (pk,ck)-bucketed layout Spark
    * elides the shuffle too).
    */
  def perPartitionLimit(df: DataFrame, pk: Seq[String], clusteringOrder: Seq[Column],
                        n: Int, rowNumberCol: String = "rn"): DataFrame = {
    val w = Window.partitionBy(pk.map(col): _*).orderBy(clusteringOrder: _*)
    df.withColumn(rowNumberCol, row_number().over(w)).filter(col(rowNumberCol) <= n)
  }

  /** PER PARTITION LIMIT as a bounded top-k aggregate
    * ([[graft.functions.TopKRowsAgg]]): identical semantics to
    * [[perPartitionLimit]], but the map-side partial buffer keeps only n
    * rows per key, so the shuffle ships ≤ n rows × keys-per-task instead
    * of every clustering row — the winning shape when partitions are wide
    * (the reference's data model) and n is small. Requires
    * `Functions.ensure` on the session. `clustering` is (column, desc).
    */
  def perPartitionLimitAgg(df: DataFrame, pk: Seq[String],
                           clustering: Seq[(String, Boolean)], n: Int,
                           rowNumberCol: String = "rn"): DataFrame = {
    val payload = df.columns.filterNot(pk.contains).toSeq
    val sortIdx = clustering.map { case (c, _) => payload.indexOf(c) }
    require(sortIdx.forall(_ >= 0), s"clustering columns $clustering must be non-key columns")
    val topk = call_function("topk_rows_agg",
      struct(payload.map(col): _*), lit(n),
      lit(sortIdx.toArray), lit(clustering.map(_._2).toArray))
    df.groupBy(pk.map(col): _*)
      .agg(topk.as("_topk"))
      .select(pk.map(col) :+ posexplode(col("_topk")): _*)
      .select(pk.map(col) ++ payload.map(c => col(s"col.$c")) :+
        (col("pos") + 1).cast("int").as(rowNumberCol): _*)
  }

  /** Last-write-wins reconciliation (reference `db/rows/Cells.java:115-160`):
    * keep the newest version of each row key; on timestamp tie a tombstone
    * beats a live cell, then higher value wins. `orderCols` must encode that
    * total order descending. One hash-shuffle on the key; map-side nothing to
    * combine (row_number), but AQE skew-split handles hot keys.
    */
  def lwwLatest(df: DataFrame, keys: Seq[String], orderDesc: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(orderDesc: _*)
    df.withColumn("_lww_rn", row_number().over(w))
      .filter(col("_lww_rn") === 1)
      .drop("_lww_rn")
  }

  /** Mutation-log compaction: LWW + tombstone semantics. Rows whose winning
    * version is a delete vanish (range/row tombstones,
    * `db/DeletionTime.java`). `isDelete` marks tombstone records in the log.
    */
  def compactLog(log: DataFrame, keys: Seq[String], tsCol: Column,
                 tieBreak: Seq[Column], isDelete: Column): DataFrame = {
    val ord = (tsCol.desc +: isDelete.cast("int").desc +: tieBreak.map(_.desc))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    log.withColumn("_is_del", isDelete)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && !col("_is_del"))
      .drop("_rn", "_is_del")
  }

  /** The MERGE form of [[compactLog]]: the winning record per key INCLUDING
    * deletes, flagged `_deleted` — a view sink must SEE the delete to remove
    * the key (WHEN MATCHED AND _deleted THEN DELETE); dropping it upstream
    * leaves the stale pre-delete row in the view forever.
    */
  def compactLogForMerge(log: DataFrame, keys: Seq[String], tsCol: Column,
                         tieBreak: Seq[Column], isDelete: Column): DataFrame = {
    val ord = (tsCol.desc +: isDelete.cast("int").desc +: tieBreak.map(_.desc))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
    log.withColumn("_deleted", isDelete)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Multi-column (tuple) relation on a clustering prefix
    * (`cql3/MultiColumnRelation.java`): lexicographic `(c1,c2) op (v1,v2)`
    * expanded to the boolean DNF Catalyst can push down per-column:
    * `(c1 > v1) OR (c1 = v1 AND c2 > v2) ...`. The first disjunct's leading
    * column range reaches the parquet min/max stats.
    */
  def tupleCompare(cols: Seq[Column], bounds: Seq[Column], op: String): Column = {
    require(cols.length == bounds.length && cols.nonEmpty)
    val strict = op == ">" || op == "<"
    val gt = op.startsWith(">")
    def cmp(c: Column, b: Column) = if (gt) c > b else c < b
    val disjuncts = cols.indices.map { i =>
      val eqPrefix = (0 until i).map(j => cols(j) === bounds(j))
      val last =
        if (i == cols.length - 1 && !strict) cmp(cols(i), bounds(i)) || cols(i) === bounds(i)
        else cmp(cols(i), bounds(i))
      (eqPrefix :+ last).reduce(_ && _)
    }
    disjuncts.reduce(_ || _)
  }

  /** `SELECT DISTINCT pk...` — distinct partitions
    * (`SelectStatement.java:598-608`): pure hash-aggregate on the partition
    * key; partial aggregation makes this map-side cheap.
    */
  def distinctPartitions(df: DataFrame, pk: Seq[String]): DataFrame =
    df.select(pk.map(col): _*).distinct()

  /** Paging analog (`service/pager/PartitionRangeQueryPager.java`): the
    * reference pages with protocol-level PagingState cursors; the Spark
    * shape is a stateless RESTART — each page selects rows with
    * `token(pk) > last seen token` in token order, limited to the page
    * size. The token predicate is a codegen'd scan filter, so each page is
    * a pruned scan, not a skip-scan: the standard huge-export pattern.
    */
  def tokenPage(df: DataFrame, pk: Seq[Column], after: Option[(Long, Seq[Any])],
                pageSize: Int): DataFrame = {
    val tok =
      if (pk.length == 1) graft.functions.Functions.cassandra_token(pk.head)
      else call_function("cassandra_token", pk: _*)
    // the restart cursor is (token, pk) like the reference's PagingState —
    // a token-only cursor would skip rows whose key COLLIDES on the
    // page-boundary token (expected at 10^10 rows over a 64-bit space)
    val paged = after.map { case (t, lastPk) =>
      require(lastPk.length == pk.length,
        s"cursor carries ${lastPk.length} pk values for ${pk.length} pk columns")
      val pkAfter = pk.zip(lastPk).foldRight(lit(false)) {
        case ((c, v), acc) => c > lit(v) || (c === lit(v) && acc)
      }
      df.filter(tok > lit(t) || (tok === lit(t) && pkAfter))
    }.getOrElse(df)
    paged.withColumn("_tok", tok)
      .orderBy(col("_tok").asc +: pk: _*)
      .limit(pageSize)
  }

  /** Static-column emulation (`SelectStatement.java:807-850`): one value per
    * partition attached to every row — `first_value` over the partition
    * window in clustering order.
    */
  def withStatic(df: DataFrame, pk: Seq[String], clusteringOrder: Seq[Column],
                 staticOf: Column, as: String): DataFrame = {
    val w = Window.partitionBy(pk.map(col): _*).orderBy(clusteringOrder: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    df.withColumn(as, first(staticOf).over(w))
  }
}
