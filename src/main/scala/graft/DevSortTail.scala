package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextOps

/** Dev-only r17 A/B: does a single-partition final sort (legal for
  * bounded report outputs — the frame is #sources-row at any scale) beat
  * the range-partitioned global sort's sampling pass? Interleaved reps
  * (A,B,A,B,...) so JVM warmup drift cancels.
  */
object DevSortTail {
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

    // q65's body minus the tail — the report frame both tails consume
    def report() = {
      val st = Tables.documents(spark, sfDir)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"),
          sum(size(TextOps.tokens(col("text"))).cast(LongType)).as("n_tokens"))
        .withColumn("s100", floor(sqrt(col("n_tokens")) * 100).cast(LongType))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tot = st.agg(sum(col("s100")).as("z"))
      st.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          round(col("s100") * 1.0 / col("z"), 4).as("weight"),
          round(lit(1000000.0) * (col("s100") * 1.0 / col("z")) / col("n_tokens"), 4)
            .as("epochs"))
    }
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime()
      f
      val s = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      s
    }
    def runA(): Double = time {
      report().orderBy("source").write.format("noop").mode("overwrite").save()
    }
    def runB(): Double = time {
      report().coalesce(1).orderBy("source")
        .write.format("noop").mode("overwrite").save()
    }
    runA(); runB(); runA(); runB() // warm both code paths
    val as = collection.mutable.ArrayBuffer[Double]()
    val bs = collection.mutable.ArrayBuffer[Double]()
    (1 to 9).foreach { _ => as += runA(); bs += runB() }
    def med(x: Seq[Double]) = x.sorted.apply(x.size / 2)
    println(f"[sorttail] rangeSort  median=${med(as.toSeq) * 1000}%6.1fms  all=${as.map(v => f"${v * 1000}%.0f").mkString(",")}")
    println(f"[sorttail] coalesce1  median=${med(bs.toSeq) * 1000}%6.1fms  all=${bs.map(v => f"${v * 1000}%.0f").mkString(",")}")
    spark.stop()
  }
}
