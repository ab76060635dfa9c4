package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: q51_bloom_decontaminate dissection (VERDICT r12 item 2,
  * 2.3× cross-window). q51 is q44's exact semantics through the
  * bloom-prefilter SCALE path; at sf0.1 the benchmark set is 5 docs, so
  * every millisecond past q44's wall is bloom machinery: (a) the
  * persist+count sizing action, (b) the buildLongFilter aggregation
  * action, (c) the exact-verify join's RECOMPUTE of the bench distinct
  * (the bench cache is released before the facade returns — the
  * cache-leak-free price). This harness times q44, q51, and q51 with
  * the bench cache LEAKED through execution (isolating (c)), plus the
  * two driver actions alone (isolating (a)+(b)).
  */
object DevQ51 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
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
    import graft.operators.Decontaminate
    import graft.functions.BloomOps

    def time(label: String, reps: Int = 5)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[devq51] $label%-28s ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }

    def docs = Tables.documents(spark, sfDir)
    def shingled = Decontaminate.shingleSet(docs, "doc_id", "text")
    def corpusSh = shingled.filter(col("doc_id") >= 5)
    def benchSh = shingled.filter(col("doc_id") < 5)
    def ids = docs.filter(col("doc_id") >= 5).select("doc_id")

    // 0. the exact broadcast form (q44) — the floor q51 adds machinery to
    time("q44_exact_broadcast") {
      Decontaminate.overlap(corpusSh, benchSh, ids, "doc_id").orderBy("doc_id")
    }
    // 1. shipped q51
    time("q51_shipped") {
      Decontaminate.overlapBloom(corpusSh, benchSh, ids, "doc_id")
        .orderBy("doc_id")
    }
    // 2. the two driver-side bloom actions alone (persist+count+build):
    // measures the fixed job-launch floor the bloom path pays before the
    // result plan even starts
    time("bloom_actions_only", reps = 5) {
      val bench = benchSh.select("sh").distinct()
      bench.persist()
      try BloomOps.buildLongFilter(bench, "sh", math.max(bench.count(), 1L), 0.01)
      finally bench.unpersist(blocking = false)
      ids.limit(1) // a near-free plan so the noop sink has something
    }
    // 3. q51 with the bench cache LEAKED through execution — the verify
    // join reads the cache instead of recomputing the bench distinct;
    // the delta vs q51_shipped prices the cache-leak-free recompute
    time("q51_leaked_cache") {
      val bench = benchSh.select("sh").distinct()
      bench.persist()
      val bloom = BloomOps.buildLongFilter(
        bench, "sh", math.max(bench.count(), 1L), 0.01)
      val survivors = corpusSh.filter(BloomOps.mightContainLong(bloom, col("sh")))
      val counts = survivors.join(bench.hint("shuffle_hash"), Seq("sh"))
        .groupBy("doc_id").agg(count(lit(1)).as("n"))
      ids.join(counts, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("n"), lit(0L)).as("n_overlap"),
          (coalesce(col("n"), lit(0L)) > 0).as("contaminated"))
        .orderBy("doc_id")
    }
    spark.stop()
  }
}
