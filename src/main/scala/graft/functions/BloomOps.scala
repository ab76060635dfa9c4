package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter build/probe over a LongType key column.
  *
  * The scale story (the reason this exists next to the broadcast-set form
  * in q44): a bloom filter at 1 % fpp costs ~9.6 BITS per key versus the
  * ≥64 bits + hash-table overhead of an exact broadcast set, so a
  * 100M-shingle eval suite ships to every executor as ~120 MB of filter
  * instead of a multi-GB set — and the corpus side is then pre-cut to
  * (true overlaps + ~1 % false positives) BEFORE any join shuffle. The
  * exact verify join that removes the false positives therefore shuffles
  * ~1 % of the corpus shingle stream instead of all of it. Build is
  * distributed (per-partition filters, OR-merged on the driver — a
  * scalar-sized anchor, same class as the ANN probe lookups); probe is
  * the codegen'd BloomFilterMightContain expression Spark's own runtime
  * filtering injects.
  */
object BloomOps {

  /** Distributed build over `df(colName)` (must be LongType); returns the
    * serialized filter (org.apache.spark.util.sketch format, readFrom-
    * compatible with BloomFilterMightContain).
    */
  def buildLongFilter(df: DataFrame, colName: String,
                      expectedNumItems: Long, fpp: Double): Array[Byte] = {
    val bf: BloomFilter = df.stat.bloomFilter(colName, expectedNumItems, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** Codegen'd `might_contain(filter, value)` predicate over a LongType
    * column; `filterBytes` embeds as a binary literal (the constant-filter
    * form BloomFilterMightContain requires outside a scalar subquery).
    * False positives at the configured fpp, never false negatives — callers
    * needing exact results follow with an exact verify join on survivors.
    */
  def mightContainLong(filterBytes: Array[Byte], value: Column): Column =
    expressions.NativeExprs.bloomMightContainLong(filterBytes, value)
}
