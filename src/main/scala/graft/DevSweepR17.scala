package graft

import org.apache.spark.sql.SparkSession

/** Dev-only r17 sweep: planner/runtime conf A/B over a floor-bound query
  * subset (median of 5 full-subset passes per config) under the bench
  * config. Honest instrument for config-tier changes (guide §1.2 step 3).
  */
object DevSweepR17 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val names =
      if (args.nonEmpty) args.toSeq
      else Seq("q03_predicates", "q14_count_distinct", "q15_rollup",
        "q27_json", "q35_quality", "q48_histogram", "q53_per_source_cap",
        "q65_mix_weights", "q90_volume_anomaly", "q99_length_ks",
        "q114_stickiness", "q126_rfm_segments")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def subsetOnce(): Double = {
      val t0 = System.nanoTime()
      names.foreach { n =>
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
      }
      (System.nanoTime() - t0) / 1e9
    }
    def run(tag: String): Unit = {
      val ts = (1 to 5).map(_ => subsetOnce()).sorted
      println(f"[sweep17] $tag%-34s median=${ts(2)}%6.3f min=${ts.head}%6.3f max=${ts.last}%6.3f")
    }

    // warm the JVM/codegen on the subset first
    subsetOnce(); subsetOnce()

    run("baseline")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    run("constraintPropagation=off")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "true")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "false")
    run("dpp=off")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
    run("both off")
    spark.conf.set("spark.sql.constraintPropagation.enabled", "true")
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.enabled", "true")
    run("baseline again (drift check)")
    spark.stop()
  }
}
