package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level data profiling — the dataset-audit analytic (Deequ /
  * `SUMMARY`-style) a pipeline runs before and after every major
  * transform: one row per profiled column with row/null/distinct counts,
  * numeric min/max/mean, and lexicographic string bounds. Drift between
  * two profiles is the cheapest corruption alarm a 100 TB ingest has
  * (see [[WebCuration.snapshotDiff]] for the row-level form).
  *
  * Shape at scale: ONE aggregation pass over the table produces every
  * statistic (all columns' aggregates ride the same partial→final
  * HashAggregate; the single result row then explodes into the
  * per-column report — driver-bounded at |cols| rows). With the default
  * approximate distinct counts (HLL++, `approx_count_distinct`) the pass
  * is map-side partial-aggregable end to end. `exactDistinct = true` is
  * the audit/oracle mode: Spark plans multi-column exact distincts via
  * an Expand (one input replica per distinct aggregate), so reserve it
  * for bounded audits — the approximate mode is the 100 TB default.
  *
  * Determinism/oracle parity: means route through DECIMAL(38,6) sums
  * (exact for inputs with ≤ 6 dp of scale — counters, ids, money-style
  * metrics) and reconstruct the mean as `qi + rem/n` where `qi` is the
  * EXACT integral quotient (truncating div) and `rem = sum − qi·n` the
  * exact small remainder. Casting the raw decimal sum to double and
  * dividing would hand the engines an epoch-µs-scale (≥2^63 after
  * scaling) decimal→double conversion, which DuckDB does not correctly
  * round (observed one-ulp disagreement at sf0.001); `qi` stays under
  * 2^53 (exact in double) and `rem` is small, so both engines perform
  * the identical correctly-rounded IEEE ops. Null-only columns report a
  * null mean, not NaN.
  */
object Profile {

  def profile(df: DataFrame, cols: Seq[String],
              exactDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    val schema = df.schema
    val missing = cols.filterNot(schema.fieldNames.contains)
    require(missing.isEmpty, s"profile: unknown columns ${missing.mkString(", ")}")
    def kind(dt: DataType): String = dt match {
      case _: NumericType => "num"
      case StringType     => "str"
      case _              => "other"
    }
    def statAggs(withDistinct: Boolean): Seq[Column] =
      count(lit(1)).as("_n") +: cols.flatMap { c =>
        val dt = schema(c).dataType
        val base = Seq(count(col(c)).as(s"_nn_$c")) ++
          (if (withDistinct) Seq(approx_count_distinct(col(c)).as(s"_dist_$c"))
           else Nil)
        kind(dt) match {
          case "num" => base ++ Seq(
            min(col(c)).cast("double").as(s"_min_$c"),
            max(col(c)).cast("double").as(s"_max_$c"),
            sum(col(c).cast(DecimalType(38, 6))).as(s"_sum_$c"))
          case "str" => base ++ Seq(
            min(col(c)).as(s"_smin_$c"),
            max(col(c)).as(s"_smax_$c"))
          case _ => base
        }
      }
    val agged =
      if (!exactDistinct) {
        val aggs = statAggs(withDistinct = true)
        df.agg(aggs.head, aggs.tail: _*)
      } else {
        // Exact mode, one single-distinct aggregation per column instead of
        // one multi-distinct pass: Spark plans N exact distincts in a single
        // Aggregate via an Expand (N+1 input replicas) whose N+1-key partial
        // aggregate falls back to SortAggregate (the first()-over-string
        // buffers are not hash-aggregable), i.e. two full Sorts of the
        // replicated input. N separate subtrees each stay a codegen
        // HashAggregate over a column-pruned scan (each scan reads ONE
        // column's parquet pages), the 1-row results recombine by cross
        // join, and the independent subtrees schedule concurrently. Same
        // exact counts, same single output row.
        val aggs = statAggs(withDistinct = false)
        val base = df.agg(aggs.head, aggs.tail: _*)
        cols.foldLeft(base) { (acc, c) =>
          acc.crossJoin(df.agg(countDistinct(col(c)).as(s"_dist_$c")))
        }
      }
    val nullD = lit(null).cast("double")
    val nullS = lit(null).cast("string")
    val rows = cols.map { c =>
      val (numMin, numMax, numAvg, strMin, strMax) = kind(schema(c).dataType) match {
        case "num" =>
          val s = col(s"_sum_$c"); val nn = col(s"_nn_$c")
          // exact integral quotient (long, ≤2^53-exact in double) + exact
          // small remainder — see the class doc's determinism note. The
          // quotient convention is pinned TOWARD ZERO (Spark `div`
          // truncates); any cross-engine oracle must match it — a floor
          // division differs by 1 on negative non-integral sums and the
          // two double reconstructions then round differently
          val qi = call_function("div", s, nn)
          val rem = s - qi.cast(DecimalType(38, 6)) * nn
          (col(s"_min_$c"), col(s"_max_$c"),
            when(nn > 0,
              qi.cast("double") + rem.cast("double") / nn.cast("double")),
            nullS, nullS)
        case "str" => (nullD, nullD, nullD, col(s"_smin_$c"), col(s"_smax_$c"))
        case _     => (nullD, nullD, nullD, nullS, nullS)
      }
      struct(lit(c).as("col_name"), col("_n").as("n_rows"),
        (col("_n") - col(s"_nn_$c")).as("n_nulls"),
        col(s"_dist_$c").cast("long").as("n_distinct"),
        numMin.as("num_min"), numMax.as("num_max"), numAvg.as("num_avg"),
        strMin.as("str_min"), strMax.as("str_max"))
    }
    agged.select(explode(array(rows: _*)).as("p")).select("p.*")
  }
}
