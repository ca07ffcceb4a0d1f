package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY §2) over the driver's parquet
  * tables; `oracleSql` the DuckDB-equivalent SQL for every hash-checkable
  * query (queries whose semantics DuckDB can't express — murmur3 token
  * ranges, LSH candidate sets — are registered without an oracle and get the
  * driver's rows-only check; their content is asserted in ScalaTest specs).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0:
    * the TPC-H-Q5-shaped multiway join (broadcast dims + one fact shuffle).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.byName("q_join_multiway").impl(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all.map(q => q.name -> q.impl).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    Queries.all.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
