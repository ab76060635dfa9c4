package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: bench-identical timing of the round-7 session-4 additions
  * (q61, q63) against their structural sibling q31, isolating plan cost
  * from the driver window's host drift.
  */
object DevQ6163 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = Seq("q31_jaccard_pairs", "q61_cluster_profile", "q63_containment")
    // warmup
    names.foreach { n =>
      SparkEntry.queries(n)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
    }
    names.foreach { n =>
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[dev] $n%-22s med=${ts(2)}%6.3f  all=${ts.map(t => f"$t%5.3f").mkString(",")}")
    }
    spark.stop()
  }
}
