package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed-aggregator surface (SURVEY §2.2 UDF/UDAF list): a decimal-safe
  * weighted average as a demonstration `Aggregator[IN, BUF, OUT]`.
  * BigDecimal accumulation makes the result independent of partition count
  * and merge order — the same determinism rule (§7.3) the SQL catalog
  * applies with DECIMAL(18,2) casts.
  */
object Aggs {

  final case class ValueWeight(value: Double, weight: Double)
  final case class WAvgBuf(num: BigDecimal, den: BigDecimal)

  /** Weighted average of `value` by `weight`, decimal-accumulated,
    * NaN when total weight is zero.
    */
  object WeightedAvg extends Aggregator[ValueWeight, WAvgBuf, Double] {
    private def dec(d: Double): BigDecimal =
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP)

    def zero: WAvgBuf = WAvgBuf(BigDecimal(0), BigDecimal(0))
    def reduce(b: WAvgBuf, in: ValueWeight): WAvgBuf =
      WAvgBuf(b.num + dec(in.value) * dec(in.weight), b.den + dec(in.weight))
    def merge(a: WAvgBuf, b: WAvgBuf): WAvgBuf =
      WAvgBuf(a.num + b.num, a.den + b.den)
    def finish(b: WAvgBuf): Double =
      if (b.den == 0) Double.NaN
      else (b.num / b.den).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    def bufferEncoder: Encoder[WAvgBuf] = Encoders.product[WAvgBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  final case class VecSumBuf(s: Array[Double], n: Long)

  /** Element-wise mean of float vectors (the centroid aggregate) as a
    * typed `Aggregator`: each task folds its rows into ONE d-length
    * double buffer, so the shuffle carries one (d·8 B, count) partial per
    * (mapper, group) instead of n·d exploded dimension rows — the
    * map-side-combine shape a 100 TB centroid needs (what MLlib's KMeans
    * does internally via treeAggregate, here as a groupBy-able column).
    * A `posexplode` + `groupBy(pos)` formulation would both shuffle n·d
    * rows AND cap reduce parallelism at d partitions. Null/empty vectors
    * are ignored (standard aggregate null semantics); an all-null group
    * yields an empty array. Mixed dimensionalities within a group are a
    * caller error and throw rather than mis-aggregate.
    */
  object VecAvg extends Aggregator[Array[Float], VecSumBuf, Array[Double]] {
    def zero: VecSumBuf = VecSumBuf(Array.emptyDoubleArray, 0L)
    def reduce(b: VecSumBuf, in: Array[Float]): VecSumBuf = {
      if (in == null || in.isEmpty) b
      else if (b.n == 0L) {
        val s = new Array[Double](in.length)
        var i = 0
        while (i < in.length) { s(i) = in(i).toDouble; i += 1 }
        VecSumBuf(s, 1L)
      } else {
        require(b.s.length == in.length,
          s"VecAvg: dim mismatch ${b.s.length} vs ${in.length}")
        var i = 0
        while (i < in.length) { b.s(i) += in(i).toDouble; i += 1 }
        VecSumBuf(b.s, b.n + 1L)
      }
    }
    def merge(a: VecSumBuf, b: VecSumBuf): VecSumBuf = {
      if (a.n == 0L) b
      else if (b.n == 0L) a
      else {
        require(a.s.length == b.s.length,
          s"VecAvg: dim mismatch ${a.s.length} vs ${b.s.length}")
        var i = 0
        while (i < a.s.length) { a.s(i) += b.s(i); i += 1 }
        VecSumBuf(a.s, a.n + b.n)
      }
    }
    def finish(b: VecSumBuf): Array[Double] =
      if (b.n == 0L) Array.emptyDoubleArray else b.s.map(_ / b.n)
    def bufferEncoder: Encoder[VecSumBuf] = Encoders.product[VecSumBuf]
    def outputEncoder: Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }
}
