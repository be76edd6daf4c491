package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query (TPC-H-Q1-shaped aggregation over lineitem) on
    * sf0.001; driver smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame =
    Registry.byKey("rel_agg_hash").query(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(o => o.key -> o.query).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose values are
    * engine-specific (e.g. HLL approx distinct).
    */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(o => o.oracle.map(o.key -> _)).toMap
}
