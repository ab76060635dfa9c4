package graft

import org.apache.spark.sql.SparkSession

/** Dev-only floor profiler: times one catalog query under several runtime
  * configs in a single JVM to attribute the per-query fixed cost
  * (AQE, shuffle partitions, range-sampling for orderBy, broadcasts).
  */
object DevFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("q02_docs_scan", "q03_predicates", "q04_join_multiway",
                         "q13_tpch_q1", "q17_ranking")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time(tag: String, name: String): Unit = {
      val fn = SparkEntry.queries(name)
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[floor] $name%-24s $tag%-28s median=${ts(2)}%6.3f min=${ts.head}%6.3f")
    }

    for (name <- names) {
      time("baseline(aqe,32part)", name)
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      time("advisory=1m", name)
      spark.conf.set("spark.sql.shuffle.partitions", "8")
      time("advisory=1m,shuffle=8", name)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "32")
      time("advisory=1m,sh=8,init=32", name)
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      spark.conf.unset("spark.sql.adaptive.coalescePartitions.initialPartitionNum")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
      println()
    }
    spark.stop()
  }
}
