package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Catalog

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-way join + decimal-safe aggregation (SURVEY §2.2 Q4).
    */
  def entry(spark: SparkSession): DataFrame =
    Catalog.byName("q04_join_multiway").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops that are not
    * SQL-expressible on the oracle (driver records a rows-only check).
    */
  def oracleSql: Map[String, String] =
    Catalog.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
