package graft.operators

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks natively. */
object Joins {

  /** As-of join (the time-series state-attach): every left row picks up
    * the MOST RECENT right row of its key with `rightTs <= leftTs` —
    * prices at trade time, session state at event time, the last config
    * before each request. Left rows with no prior right row keep null
    * attachments (left-join semantics, matching `ASOF LEFT JOIN`).
    *
    * Spark-first shape: NOT a range join (quadratic per key) and not a
    * per-key collect — both sides union into one stream, ONE hash
    * shuffle on the key sorts it by `(ts, side, id)`, and a running
    * `last(payload, ignoreNulls)` window carries each right payload
    * forward to the left rows it governs. Bounded state (one payload per
    * open frame), linear work, and the window's sort is the same
    * key-partitioned sort every sessionization pass uses.
    *
    * Ordering ties: a right row SHARES visibility with left rows at the
    * exact same timestamp (`>=` semantics — the right side sorts first
    * at equal ts). Among right rows equal in `(key, ts)` the one with
    * the greatest `rightIdCol` wins deterministically; without an id
    * column, callers must ensure `(key, ts)` is unique on the right or
    * the pick is tie-ambiguous.
    *
    * `attach` names the right columns to carry; they land on the left
    * rows as `<prefix><name>`.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTsCol: String, rightTsCol: String, attach: Seq[String],
               rightIdCol: Option[String] = None,
               prefix: String = "asof_"): DataFrame = {
    require(attach.nonEmpty, "asofJoin: no columns to attach")
    val lcols = left.columns
    require(!lcols.exists(c => attach.contains(prefix + c)),
      s"asofJoin: prefix '$prefix' collides with a left column")
    val l = left.select(col(keyCol).as("_k"),
      col(leftTsCol).cast("long").as("_ts"), lit(0).as("_isR"),
      lit(0L).as("_rid"), struct(lcols.map(col): _*).as("_lrow"))
    val r = right.select(col(keyCol).as("_k"),
      col(rightTsCol).cast("long").as("_ts"), lit(1).as("_isR"),
      rightIdCol.map(col(_).cast("long")).getOrElse(lit(0L)).as("_rid"),
      struct(attach.map(col): _*).as("_pay"))
    val combined = l.unionByName(r, allowMissingColumns = true)
    // right rows sort BEFORE left rows at equal ts (>= semantics); the
    // running last() then carries the newest visible payload forward
    val w = Window.partitionBy("_k")
      .orderBy(col("_ts").asc, col("_isR").desc, col("_rid").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    combined
      .withColumn("_c", last(col("_pay"), ignoreNulls = true).over(w))
      .filter(col("_isR") === 0)
      .select(col("_lrow.*") +:
        attach.map(a => col(s"_c.$a").as(prefix + a)): _*)
  }
}
