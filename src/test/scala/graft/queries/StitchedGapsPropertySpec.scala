package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => ScTest}

/** Generative pin for the r11 stitched gap extraction: over RANDOM event
  * streams — duplicate timestamps, negative epochs, clustered and sparse
  * arrivals, multiple types — and RANDOM bucket widths, the (type, bucket)
  * stitched gap multiset must equal the single per-type window lag's,
  * byte-for-byte. Deterministic seed, driver-side oracle (a plain Scala
  * sort+lag replay), small frames — the property is about ALGORITHM
  * equivalence, not scale.
  */
class StitchedGapsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val genEvents: Gen[List[(Long, Long, String)]] = for {
    n <- Gen.choose(0, 60)
    evs <- Gen.listOfN(n, for {
      // micros clustered around 0 with heavy duplication pressure and
      // negative values; a second regime far away exercises empty buckets
      base <- Gen.oneOf(0L, 86400000000L, -86400000000L)
      off <- Gen.choose(-50L, 50L)
      scale <- Gen.oneOf(1L, 1000000L, 3600000000L)
      ty <- Gen.oneOf("a", "b", "c")
    } yield (base + off * scale, ty))
  } yield evs.zipWithIndex.map { case ((us, ty), i) => (us, i.toLong, ty) }

  private val genBucket: Gen[Long] =
    Gen.oneOf(1L, 7L, 60000000L, 3600000000L, 86400000000L)

  /** Rebuild exact micros through a timestamp column — the helper reads
    * unix_micros(ts). Java's truncating / and % compose exactly for
    * negative micros too.
    */
  private def eventsDf(evs: List[(Long, Long, String)]) =
    evs.map { case (us, id, ty) =>
      (id, new java.sql.Timestamp(us / 1000), us % 1000, ty)
    }.toDF("event_id", "ts_ms", "us_rem", "event_type")
      .withColumn("ts", timestamp_micros(
        expr("unix_micros(cast(ts_ms as timestamp)) + us_rem")))
      .select("event_id", "ts", "event_type")

  /** Driver-side oracle: per type, sort by (us, event_id), adjacent lag. */
  private def driverGaps(evs: List[(Long, Long, String)]): Map[String, Seq[Long]] =
    evs.groupBy(_._3).map { case (ty, rows) =>
      ty -> rows.sortBy(r => (r._1, r._2)).sliding(2).collect {
        case Seq(p, c) => c._1 - p._1
      }.toSeq
    }

  test("stitched gap multiset == window-lag gap multiset on random streams (ScalaCheck)") {
    val prop = Prop.forAll(genEvents, genBucket) { (evs, bucketUs) =>
      val expect = driverGaps(evs)
        .toSeq.flatMap { case (ty, gs) => gs.map(ty -> _) }.sorted
      val got = graft.queries.Analytics.stitchedGaps(eventsDf(evs), bucketUs)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sorted
      got == expect
    }
    val res = ScTest.check(
      ScTest.Parameters.default
        .withMinSuccessfulTests(40)
        .withInitialSeed(org.scalacheck.rng.Seed(42L)), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  test("routed gapDeciles on random streams: every decile is a real gap within GK rank error") {
    val prop = Prop.forAll(genEvents) { evs =>
      val gapsByType = driverGaps(evs).map { case (t, g) => t -> g.sorted }
      val out = graft.queries.Analytics.gapDeciles(eventsDf(evs),
        scalable = true).collect()
      out.forall { r =>
        val a = gapsByType(r.getString(0))
        val v = r.getLong(2)
        // accuracy 10000 >> n: the returned element must exist and obey
        // the shared GK rank contract
        val target = math.ceil(r.getInt(1) * a.length / 10.0)
        a.contains(v) && graft.SpecHelpers.gkRankHolds(a, v, target)
      }
    }
    val res = ScTest.check(
      ScTest.Parameters.default
        .withMinSuccessfulTests(25)
        .withInitialSeed(org.scalacheck.rng.Seed(7L)), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }
}
