package graft

import org.apache.spark.sql.SparkSession

/** Dev-only floor attribution: splits a catalog query's warm wall-clock
  * into (a) plan cost — DataFrame construction + analysis + optimization +
  * physical planning, forced via queryExecution.executedPlan without
  * running a job — and (b) run cost — the noop-sink execution of an
  * ALREADY-planned query. Their sum tracks the bench's per-query time, so
  * the split shows how much of the local per-query floor is driver-side
  * planning (irreducible without caching plans, which the bench contract —
  * fresh DataFrame per rep, like any real client — forbids) versus
  * execution.
  */
object DevPlanCost {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("q03_predicates", "q06b_scalar_subquery", "q14_count_distinct",
                         "q23_strings", "q35_quality", "q15b_cube", "q17_ranking")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def med(ts: Seq[Double]): Double = ts.sorted.apply(ts.size / 2)

    for (name <- names) {
      val fn = SparkEntry.queries(name)
      // warmup (codegen, file index)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val plans = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.executedPlan // force full planning
        (System.nanoTime() - t0) / 1e9
      }
      val runs = (1 to 5).map { _ =>
        val df = fn(spark, sfDir)
        df.queryExecution.executedPlan // pre-plan outside the timer
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val endToEnd = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[plancost] $name%-24s plan=${med(plans)}%6.3f run=${med(runs)}%6.3f e2e=${med(endToEnd)}%6.3f")
    }
    spark.stop()
  }
}
