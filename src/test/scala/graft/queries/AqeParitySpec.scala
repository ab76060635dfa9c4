package graft.queries

import graft.SparkSpec

/** Cluster-readiness guard (r11): the bench runs AQE OFF as per-corpus
  * sizing for the sub-GB test data, but REAL deployments keep AQE ON
  * (BASELINE.md documents both) — so results must be byte-identical under
  * AQE re-planning (runtime coalescing, skew splits, join re-plans) and
  * under a different static shuffle width. Both are runtime SQL confs;
  * this spec flips them around a representative slice of the catalog —
  * the join family, window/rank entries, the iterative closure family,
  * the pair cores, and the routed q107/q110 forms — and requires
  * row-for-row equality with the default-config run.
  */
class AqeParitySpec extends SparkSpec {

  private val slice = Seq(
    "q04_join_multiway", // multiway join: AQE join re-planning territory
    "q08_anti_join",
    "q13_tpch_q1", // partial aggs under coalesced shuffles
    "q17_ranking", // rank windows
    "q21_topk",
    "q31_jaccard_pairs", // the shared pair core
    "q50_batch_ann",
    "q54_dup_spans", // sh-partitioned window on the one exchange
    "q68_dup_clusters", // iterative CC under re-planned shuffles
    "q107_gap_deciles",
    "q110_value_percentiles",
    "q126_rfm_segments", // cum windows + broadcast mark arrays
    "q45_tfidf", // df-attach join shape
    "q55_curate", // the composed curation pipeline (observe + stages)
    "q62_pack", // recursive next-fit packing
    "q135_weighted_sample") // narrow scan reduction

  private def rows(name: String): Seq[Seq[Any]] = {
    val r = Catalog.byName(name).build(spark, sf0001)
      .collect().map(_.toSeq).toSeq
    spark.catalog.clearCache()
    r
  }

  test("representative catalog slice is byte-identical under AQE OFF (bench config) and AQE ON (cluster config)") {
    val aqe = "spark.sql.adaptive.enabled"
    val sp = "spark.sql.shuffle.partitions"
    val aqe0 = spark.conf.get(aqe)
    val sp0 = spark.conf.get(sp)
    try {
      // reference run at the BENCH'S SHIPPED config — AQE off must be set
      // EXPLICITLY: Spark 4's session default is AQE ON, so inheriting
      // the suite default would compare ON vs ON and never exercise the
      // AQE-off physical paths the bench actually ships (review finding
      // r11 #3)
      spark.conf.set(aqe, "false")
      spark.conf.set(sp, "8")
      val ref = slice.map(n => n -> rows(n)).toMap
      // cluster config: AQE on, a different (prime) static width
      spark.conf.set(aqe, "true")
      spark.conf.set(sp, "13")
      slice.foreach { n =>
        assert(rows(n) === ref(n),
          s"$n diverged between AQE-off/shuffle=8 and AQE-on/shuffle=13")
      }
    } finally {
      spark.conf.set(aqe, aqe0)
      spark.conf.set(sp, sp0)
    }
  }
}
