package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys (SURVEY scale mandate: "salting for
  * skew"). AQE's runtime skew-join split handles most cases; salting is the
  * deterministic fallback when one key dominates so heavily that even split
  * partitions of it exceed executor memory, or when AQE is unavailable
  * (e.g. inside a streaming micro-batch).
  *
  * Mechanics: the probe side gets a salt in [0, n) derived from its OTHER
  * columns (deterministic, no rand() — re-runs and retries see the same
  * salt); the build side is replicated n times with every salt value. The
  * shuffle key becomes (key, salt), splitting each hot key across n
  * reducers. Row-for-row identical to the unsalted join (asserted in
  * SkewJoinSpec) at n× build-side shuffle cost — so salt only the keys that
  * need it (`hotKeys` filter) and leave the rest on the normal path.
  */
object SkewJoin {

  /** Inner equi-join `left ⋈ right` on `key`, salting `nSalts` ways.
    * `right` is the smaller (replicated) side.
    */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
                      nSalts: Int): DataFrame = {
    require(nSalts >= 1)
    val leftCols = left.columns.filter(_ != key).map(col)
    // deterministic salt from the non-key payload: xxhash64 spreads hot-key
    // rows evenly; identical rows collide on salt, which is correct (same
    // reducer, same result)
    val salted = left.withColumn("_salt",
      pmod(xxhash64(leftCols.toIndexedSeq: _*), lit(nSalts)).cast("int"))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Hybrid: salt only the keys in `hotKeys` (tiny driver-known set, e.g.
    * from approx frequency on a sample); everything else joins normally.
    * This is the shape a 100 TB job wants — n× replication confined to the
    * handful of pathological keys.
    */
  def hybridJoin(left: DataFrame, right: DataFrame, key: String,
                 hotKeys: Seq[Any], nSalts: Int): DataFrame = {
    val hot = left.filter(col(key).isin(hotKeys: _*))
    val cold = left.filter(!col(key).isin(hotKeys: _*))
    val rightHot = right.filter(col(key).isin(hotKeys: _*))
    val rightCold = right.filter(!col(key).isin(hotKeys: _*))
    saltedInnerJoin(hot, rightHot, key, nSalts)
      .unionByName(cold.join(rightCold, Seq(key)))
  }
}
