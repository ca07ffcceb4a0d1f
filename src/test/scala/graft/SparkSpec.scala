package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session base: one SparkSession per JVM (getOrCreate), smallest SF
  * fixtures for speed.
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("graft-test")
  val sf: String = "/root/testdata/sf0.001"
}
