package graft

import org.apache.spark.sql.SparkSession

/** Dev-only: dump `.explain("formatted")` for named catalog queries (or
  * all of them) to one file per query — the r17 optimization round's
  * plans/r17/<query>_{before,after}.txt artifacts. Uses the BENCH config
  * (shuffle=8, AQE off, 16m splits) so the captured plans are the shapes
  * the measured numbers ran with.
  *
  * args: <outDir> <suffix> [queryName...]
  */
object DevPlans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DevPlans <outDir> <suffix> [names...]")
    val outDir = new java.io.File(args(0))
    outDir.mkdirs()
    val suffix = args(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.length > 2) args.drop(2).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      // queryExecution.explainString is exactly what explain("formatted")
      // prints, capturable without redirecting stdout
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val f = new java.io.File(outDir, s"${n}_$suffix.txt")
      val w = new java.io.PrintWriter(f, "UTF-8")
      try w.write(txt) finally w.close()
      spark.catalog.clearCache()
      println(s"[plans] wrote ${f.getPath} (${txt.length} chars)")
    }
    spark.stop()
  }
}
