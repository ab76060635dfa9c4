package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev harness for q61: (a) oracle-parity dump of the per-vector argmax
  * stage (kept from the sf0.01 mismatch investigation), and (b) cost
  * decomposition — full query vs small-K vs scoring-projection-only —
  * separating the per-row HOF loop cost from the plan's stage floor.
  */
object DevQ61 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.VectorOps

    val emb = Tables.embeddings(spark, sfDir)
    def codebook(k: Int) = emb.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("anchor_id"), col("embedding").as("av"),
        sqrt(VectorOps.dot(col("embedding"), col("embedding"))).as("an"))
      .agg(sort_array(collect_list(
        struct(col("anchor_id"), col("av"), col("an")))).as("anchors"))
    def scored(k: Int) = emb
      .crossJoin(broadcast(codebook(k)))
      .select(col("vec_id"),
        array_max(transform(col("anchors"), a =>
          struct(
            (VectorOps.dot(col("embedding"), a.getField("av"))
              / (sqrt(VectorOps.dot(col("embedding"), col("embedding")))
                 * a.getField("an"))).as("score"),
            (-a.getField("anchor_id")).as("negid")))).as("b"))

    def time(tag: String, df: => DataFrame): Unit = {
      df.write.format("noop").mode("overwrite").save() // warm
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"[devq61] $tag%-28s med=${ts(2)}%6.3f  all=${ts.map(t => f"$t%5.3f").mkString(",")}")
    }
    time("full_q61_K256", SparkEntry.queries("q61_cluster_profile")(spark, sfDir))
    time("scoring_only_K256", scored(256))
    time("scoring_only_K16", scored(16))
    time("scan_only", emb.select(col("vec_id"),
      sqrt(VectorOps.dot(col("embedding"), col("embedding"))).as("en")))
    spark.stop()
  }
}
