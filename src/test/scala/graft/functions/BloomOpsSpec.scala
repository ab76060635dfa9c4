package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BloomOps contract: build/probe round-trip through Spark's own
  * util.sketch format — no false negatives ever, false positives bounded
  * near the configured fpp (the exact-verify join in q51 relies on the
  * first property; the scale math relies on the second).
  */
class BloomOpsSpec extends SparkSpec {

  test("no false negatives; false positives near configured fpp") {
    import spark.implicits._
    val members = (0L until 20000L).map(_ * 2654435761L).toDF("k")
    val bytes = BloomOps.buildLongFilter(members, "k", 20000L, 0.01)

    // every inserted key must probe true
    val misses = members
      .filter(!BloomOps.mightContainLong(bytes, col("k"))).count()
    assert(misses === 0L, s"$misses false negatives")

    // a disjoint key set (odd values — members are all even) must probe
    // true at ~fpp; allow generous slack for murmur variance
    val outsiders = (0L until 20000L).map(_ * 2654435761L + 1L).toDF("k")
    val fp = outsiders
      .filter(BloomOps.mightContainLong(bytes, col("k"))).count()
    assert(fp.toDouble / 20000 < 0.03, s"fp rate ${fp / 20000.0} >> 1%")
  }
}
