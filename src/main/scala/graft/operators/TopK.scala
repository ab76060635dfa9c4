package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.expressions.NativeExprs

/** Exact top-k rows per group, by (score DESC, tag ASC), as ONE hash
  * aggregation (SURVEY §2.2 window family — the 100 TB shape).
  *
  * `row_number() OVER (PARTITION BY g ORDER BY s DESC, t)` must shuffle
  * and sort EVERY input row into its group's partition before any row can
  * be cut; this operator aggregates with a bounded k-entry buffer per
  * group, so the map side already reduces each (mapper, group) to ≤ k
  * entries and only those tiny buffers shuffle. Same rank semantics
  * (ties broken by tag ASC), asserted row-identical to the window form in
  * TopKSpec.
  *
  * Output columns: groupCols…, rnk (1-based, dense by construction — one
  * row per rank), tag, score.
  *
  * PRECONDITION: `scoreCol` and `tagCol` must be non-null. The aggregate
  * ignores null entries (standard aggregate null semantics, pinned in
  * TopKSpec), and a group whose rows are ALL null disappears entirely —
  * whereas `row_number() OVER (...)` would rank null-score rows last and
  * keep the group. Callers with nullable scores must coalesce/filter
  * first or they silently lose rows relative to the window form.
  */
object TopK {

  def perGroup(df: DataFrame, groupCols: Seq[String], scoreCol: String,
               tagCol: String, k: Int): DataFrame = {
    val agged = df.groupBy(groupCols.map(col): _*)
      .agg(NativeExprs.topKByScore(col(scoreCol), col(tagCol), k).as("_top"))
    agged
      .select(groupCols.map(col) :+ posexplode(col("_top")): _*)
      .select(groupCols.map(col) ++ Seq(
        (col("pos") + 1).cast("int").as("rnk"),
        col("col.tag").as(tagCol),
        col("col.score").as(scoreCol)): _*)
  }
}
