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
}
