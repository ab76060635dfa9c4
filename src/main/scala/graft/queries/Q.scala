package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One catalog entry: a Spark-side builder plus (when SQL-expressible) the
  * equivalent DuckDB oracle SQL the driver hash-compares against at sf0.01.
  *
  * Determinism contract (SURVEY §7.3): every query ends in a global ORDER BY
  * over a unique key set; money aggregates run on DECIMAL(18,2) then cast to
  * DOUBLE; avg/division/cosine results are round(_, 4); timestamps surface as
  * strings or epoch-micros BIGINT, never raw timestamp columns; output column
  * names are identical on both sides (the driver sorts columns by name).
  */
final case class Q(
    name: String,
    doc: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Q {
  def apply(name: String, doc: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): Q =
    Q(name, doc, build, Some(oracle))

  def cap(name: String, doc: String)(
      build: (SparkSession, String) => DataFrame): Q =
    Q(name, doc, build, None)
}
