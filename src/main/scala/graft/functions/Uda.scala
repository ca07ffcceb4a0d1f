package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** User-defined-aggregate surface (reference `cql3/functions/UDAggregate
  * .java:44-120`: CREATE AGGREGATE ... SFUNC s STYPE t [FINALFUNC f]
  * [INITCOND i]). The CQL fold shape maps 1:1 onto Spark's typed
  * `Aggregator[IN, BUF, OUT]`: INITCOND = `zero`, SFUNC = `reduce`,
  * FINALFUNC = `finish`; `merge` is the partial-aggregation combine the
  * reference never needed (single-node fold) but Spark gets map-side.
  */
object Uda {

  /** Example UDA: sum of squares (SFUNC acc + v*v, INITCOND 0). */
  object SumOfSquares extends Aggregator[Long, Long, Long] {
    override def zero: Long = 0L
    override def reduce(acc: Long, v: Long): Long = acc + v * v
    override def merge(a: Long, b: Long): Long = a + b
    override def finish(acc: Long): Long = acc
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Example UDA with a FINALFUNC: numerically-stable mean via (count, sum)
    * state and a finishing division.
    */
  case class AvgState(n: Long, s: Double)
  object MeanFold extends Aggregator[Double, AvgState, Double] {
    override def zero: AvgState = AvgState(0L, 0.0)
    override def reduce(acc: AvgState, v: Double): AvgState = AvgState(acc.n + 1, acc.s + v)
    override def merge(a: AvgState, b: AvgState): AvgState = AvgState(a.n + b.n, a.s + b.s)
    override def finish(acc: AvgState): Double = if (acc.n == 0) 0.0 else acc.s / acc.n
    override def bufferEncoder: Encoder[AvgState] = Encoders.product[AvgState]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Idempotent registration (the CQL-compat `CREATE AGGREGATE` analog).
    * Skips sessions already registered so repeated prep() calls don't log
    * a "function replaced" WARN per query.
    */
  private val registered = java.util.Collections.synchronizedSet(
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean]()))

  def register(spark: SparkSession): Unit = {
    if (!registered.add(spark)) return
    spark.udf.register("uda_sum_sq", udaf(SumOfSquares))
    spark.udf.register("uda_mean", udaf(MeanFold))
  }
}
