package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join (SURVEY §2.2 Q12, §4 item 3): for each left row,
  * the latest right row with rightTime strictly earlier than leftTime within
  * the same key.
  *
  * Implementation is the union-merge formulation, not a band join: tag both
  * sides, union, and run one `last(..., ignoreNulls)` window over
  * (key, time). Cost = ONE shuffle on the key + one sort — the same shape a
  * dedicated range-partitioned merge strategy would produce, but expressed
  * in operators Catalyst already knows how to plan, spill and re-balance.
  * A band join would duplicate right rows per time bucket; a window-over-
  * left-only (q12's declared form) only works when both sides come from the
  * same table. This operator handles arbitrary left/right inputs.
  *
  * At 100 TB: the shuffle carries each input row exactly once; skewed keys
  * are AQE-splittable because the window partitions by key only.
  */
object AsOfJoin {

  /** @param left       probe side
    * @param right      quote side (its latest earlier row is attached)
    * @param keyCols    equi-key column names present on both sides
    * @param leftTime   event-time column on `left`
    * @param rightTime  event-time column on `right`
    * @param rightVals  right columns to attach (emitted as `asof_<name>`)
    * @param strict     true = strictly earlier (right.ts < left.ts);
    *                   false = earlier-or-equal, matching the reference
    *                   window semantics of q12 / pandas merge_asof
    */
  def join(left: DataFrame, right: DataFrame, keyCols: Seq[String],
           leftTime: String, rightTime: String, rightVals: Seq[String],
           strict: Boolean = true): DataFrame = {
    val leftCols = left.columns
    // The attached right values travel as ONE struct so the window picks a
    // whole right ROW atomically — attaching columns individually with
    // last(ignoreNulls) would fall back to an OLDER right row for any
    // column whose latest value is null, mixing values across rows.
    val payloadType = org.apache.spark.sql.types.StructType(
      rightVals.map(v => right.schema(v)))
    val l = left.select(
      keyCols.map(col) ++
        Seq(col(leftTime).as("_asof_ts"), lit(1).as("_asof_side"),
            struct(leftCols.toIndexedSeq.map(col): _*).as("_asof_left"),
            lit(null).cast(payloadType).as("_asof_payload")): _*)
    val r = right.select(
      keyCols.map(col) ++
        Seq(col(rightTime).as("_asof_ts"), lit(0).as("_asof_side"),
            lit(null).cast(l.schema("_asof_left").dataType).as("_asof_left"),
            struct(rightVals.map(col): _*).as("_asof_payload")): _*)

    // Strictness is encoded in the tie order at equal timestamps, with the
    // frame always ending at -1 (exclude current row):
    //   strict (right.ts <  left.ts): left rows sort BEFORE right rows at
    //     the same ts, so same-ts right rows fall outside the frame;
    //   non-strict (right.ts <= left.ts): right rows sort first and are
    //     inside the frame.
    val sideOrder = if (strict) -col("_asof_side") else col("_asof_side")
    // Final tie-break: the payload struct itself (ADVICE r1). When several
    // right rows share (key, ts), "last" would otherwise pick a
    // partition-sort-dependent row; ordering by the payload pins the winner
    // to the greatest payload under struct ordering — deterministic across
    // runs and layouts (§7.3). Requires orderable payload column types
    // (no maps), which is also what makes them attachable values.
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_asof_ts").asc, sideOrder.asc, col("_asof_payload").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    // last right PAYLOAD in the frame; left rows carry null payloads → ignored
    val attached = l.unionByName(r)
      .select(col("_asof_side"), col("_asof_left"),
        last(col("_asof_payload"), ignoreNulls = true).over(w).as("_asof_hit"))
      .filter(col("_asof_side") === 1)
    attached.select(leftCols.toIndexedSeq.map(c => col(s"_asof_left.$c").as(c)) ++
      rightVals.map(v => col(s"_asof_hit.$v").as(s"asof_$v")): _*)
  }
}
