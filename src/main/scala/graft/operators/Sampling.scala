package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines. `rand()`-based
  * sampling (df.sample / stat.sampleBy) changes membership with partition
  * layout and run; these operators decide membership from a CONTENT hash,
  * so a sample is reproducible across runs, clusters and re-partitions —
  * the property that makes dataset ablations comparable.
  */
object Sampling {

  private val M = 1000000L // hash-space modulus: fractions at 1e-6 grain

  /** Membership score in [0, 1e6): md5-derived, engine-portable (the same
    * value is computable in any engine with md5 — the q40 oracle recomputes
    * it in DuckDB SQL).
    */
  def score(id: Column, salt: Long): Column =
    pmod(graft.functions.expressions.NativeExprs
      .md5PrefixLong(concat(id.cast("string"), lit("#"), lit(salt)), 15),
      lit(M))

  /** Uniform deterministic sample: keep iff score < frac·1e6. */
  def uniform(df: DataFrame, idCol: String, frac: Double,
              salt: Long = 42L): DataFrame =
    df.filter(score(col(idCol), salt) < lit((frac * M).toLong))

  /** Per-stratum deterministic sampling — downsample dominant languages /
    * sources to a target mix. Unknown strata keep `default`.
    */
  def stratified(df: DataFrame, strataCol: String, idCol: String,
                 fractions: Map[String, Double], default: Double = 1.0,
                 salt: Long = 42L): DataFrame = {
    val threshold = fractions.foldLeft(lit((default * M).toLong)) {
      case (acc, (stratum, frac)) =>
        when(col(strataCol) === stratum, lit((frac * M).toLong)).otherwise(acc)
    }
    df.filter(score(col(idCol), salt) < threshold)
  }
}
