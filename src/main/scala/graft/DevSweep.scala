package graft

import org.apache.spark.sql.SparkSession

/** Dev-only config sweep: times a query subset across runtime-settable
  * conf combos (AQE, input split size, shuffle width) in one JVM, to pick
  * the per-corpus bench sizing empirically instead of by folklore.
  */
object DevSweep {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("q02_docs_scan", "q03_predicates", "q13_tpch_q1",
               "q17_ranking", "q19b_range_frame", "q22_setops",
               "q31_jaccard_pairs", "q32_minhash_lsh",
               "q33_embedding_neardup", "q42_redaction")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val combos = Seq(
      // (aqe, maxPartitionBytes, shuffle.partitions)
      ("true", "1m", "8"), ("true", "4m", "8"),
      ("false", "1m", "8"), ("false", "4m", "8"),
      ("false", "4m", "4"), ("false", "16m", "8"))

    def run(name: String): Double = {
      val fn = SparkEntry.queries(name)
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        // unpersist OUTSIDE the timed window (its cost varies by query and
        // would bias the sweep — r3 review finding)
        spark.catalog.clearCache()
        sec
      }.sorted
      ts(1)
    }

    // warm everything once under the default combo
    names.foreach(run)
    val results = combos.map { case (aqe, mpb, sh) =>
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "32")
      spark.conf.set("spark.sql.files.maxPartitionBytes", mpb)
      spark.conf.set("spark.sql.files.openCostInBytes", "64k")
      spark.conf.set("spark.sql.shuffle.partitions", sh)
      val per = names.map(n => n -> run(n))
      println(f"[sweep] aqe=$aqe%-5s mpb=$mpb%-3s sh=$sh%-2s total=${per.map(_._2).sum}%6.3f  " +
        per.map { case (n, t) => f"${n.take(14)}=$t%.3f" }.mkString(" "))
      ((aqe, mpb, sh), per.map(_._2).sum)
    }
    val best = results.minBy(_._2)
    println(s"[sweep] best: ${best._1} total=${best._2}")
    spark.stop()
  }
}
