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
    require(!attach.exists(a => lcols.contains(prefix + a)),
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

  /** Range (interval-containment) join: every point row pairs with the
    * interval rows of its key that contain it (`start <= point <= end`)
    * — events into session windows, readings into maintenance periods,
    * IPs into CIDR ranges. Inner-join semantics: points in no interval
    * drop; a point in k overlapping intervals emits k rows.
    *
    * Spark-first shape: a naive theta-join is a per-key cross product
    * (BroadcastNestedLoop at best). Here both sides BUCKETIZE on
    * `bucketWidth`: an interval explodes to the buckets it covers
    * (ceil(len/width)+1 rows of just keys+bounds+payload, never the
    * point payload), a point lands in exactly ONE bucket, and the match
    * becomes a co-partitioned EQUI-join on (key..., bucket) with the
    * containment filter on the survivors. Each (point, interval)
    * containment meets in exactly one bucket — the point's — so no
    * dedup pass is needed. Pick `bucketWidth` near the typical interval
    * length: wider buckets fatten the filter's candidate lists, finer
    * ones fatten the interval explode.
    *
    * Bucket indices use exact integer floor-division (no double
    * rounding at bucket boundaries, negatives floor correctly).
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, keyCols: Seq[String],
                pointCol: String, startCol: String, endCol: String,
                bucketWidth: Long, attach: Seq[String],
                prefix: String = "iv_"): DataFrame = {
    require(bucketWidth > 0, s"rangeJoin: bucketWidth must be positive, got $bucketWidth")
    require(attach.nonEmpty, "rangeJoin: no interval columns to attach")
    // (c - pmod(c, W)) is an exact multiple of W in LongType; `div` keeps
    // the quotient integral (Column./ is double division — loses exactness
    // past 2^53, so boundary points could land one bucket off)
    def bucketOf(c: org.apache.spark.sql.Column) =
      call_function("div", (c - pmod(c, lit(bucketWidth))).cast("long"),
        lit(bucketWidth))
    val pcols = points.columns
    val pt = points.select(Seq(struct(pcols.map(col): _*).as("_prow"),
        col(pointCol).cast("long").as("_p")) ++ keyCols.map(col): _*)
      .withColumn("_b", bucketOf(col("_p")))
    val iv = intervals.select(
        keyCols.map(col) ++ Seq(col(startCol).cast("long").as("_s"),
          col(endCol).cast("long").as("_e"),
          struct(attach.map(col): _*).as("_pay")): _*)
      .filter(col("_s") <= col("_e"))
      .withColumn("_b", explode(sequence(bucketOf(col("_s")), bucketOf(col("_e")))))
    pt.join(iv, keyCols :+ "_b")
      .filter(col("_p") >= col("_s") && col("_p") <= col("_e"))
      .select(col("_prow.*") +:
        attach.map(a => col(s"_pay.$a").as(prefix + a)): _*)
  }

  /** Skew-salted inner equi-join — the explicit answer to the hot-key
    * problem AQE's skew split can't always reach (a single key holding
    * >1 task's worth of rows on the FACT side against a non-broadcastable
    * dimension): fact rows of one key spread across `salt` sub-keys by a
    * deterministic hash of `saltExpr` (any fact-side expression with
    * per-row spread — a row id, a timestamp), the dimension side
    * replicates each row `salt` times, and the join runs on
    * (keys, salt) — every reducer now holds ≤ 1/salt of the hot key.
    * Result rows are EXACTLY the plain inner join's (the salt column
    * never changes membership, only placement); output keeps the fact
    * columns plus the dimension's non-key columns, like a plain
    * `join(..., keys)`.
    *
    * Cost model: dimension inflates ×salt (choose salt ≈ hot-key rows /
    * healthy-partition rows, not more); fact side is untouched. For a
    * broadcastable dimension prefer `broadcast()` — salting is for the
    * middle regime.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 salt: Int, saltExpr: org.apache.spark.sql.Column): DataFrame = {
    require(salt >= 1, s"saltedJoin: need salt >= 1, got $salt")
    require(keys.nonEmpty, "saltedJoin: no join keys")
    import graft.functions.Functions.murmur64
    // murmur64 is null-intolerant: without the coalesce a fact row with a
    // null saltExpr would get _salt = null and silently DROP from the
    // inner join — breaking the membership contract above
    val f = fact.withColumn("_salt",
      pmod(murmur64(coalesce(saltExpr.cast("string"), lit("")), lit(1201L)),
        lit(salt.toLong)).cast("int"))
    val d = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    f.join(d, keys :+ "_salt").drop("_salt")
  }
}
