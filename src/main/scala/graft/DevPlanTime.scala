package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: split a query's wall into (build+analyze, optimize+plan,
  * execute) under the bench config — attributes the driver gap DevJobs
  * exposes (r17 floor dissection).
  */
object DevPlanTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    args.foreach { name =>
      val fn = SparkEntry.queries(name)
      def once(): (Double, Double, Double) = {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        df.queryExecution.assertAnalyzed()
        val t1 = System.nanoTime()
        df.queryExecution.executedPlan // force optimize + physical plan
        val t2 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val t3 = System.nanoTime()
        spark.catalog.clearCache()
        ((t1 - t0) / 1e6, (t2 - t1) / 1e6, (t3 - t2) / 1e6)
      }
      once(); once()
      val (a, b, c) = once()
      println(f"[plantime] $name%-28s analyze=${a}%6.1fms plan=${b}%6.1fms exec=${c}%7.1fms")
    }
    spark.stop()
  }
}
