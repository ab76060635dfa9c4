package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Debug harness for q61 oracle parity: dumps per-vector (vec_id, cluster,
  * raw score, si) so a DuckDB diff can localize which stage diverges
  * (score doubles vs argmax vs integer rounding).
  */
object DevQ61 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.VectorOps
    val emb = Tables.embeddings(spark, sfDir)
    val codebook = emb.orderBy("vec_id").limit(256)
      .select(col("vec_id").as("anchor_id"), col("embedding").as("av"),
        sqrt(VectorOps.dot(col("embedding"), col("embedding"))).as("an"))
      .agg(collect_list(struct(col("anchor_id"), col("av"), col("an")))
        .as("anchors"))
    val scored = emb
      .crossJoin(broadcast(codebook))
      .select(col("vec_id"),
        sqrt(VectorOps.dot(col("embedding"), col("embedding"))).as("en"),
        col("embedding"), explode(col("anchors")).as("a"))
      .select(col("vec_id"),
        (VectorOps.dot(col("embedding"), col("a.av"))
          / (col("en") * col("a.an"))).as("score"),
        col("a.anchor_id").as("anchor_id"))
    val best = scored
      .groupBy("vec_id")
      .agg(max(struct(col("score"), (-col("anchor_id")).as("negid"))).as("b"))
      .select(col("vec_id"), (-col("b.negid")).as("cluster"),
        col("b.score").as("score"),
        round(col("b.score") * 10000, 0).cast(LongType).as("si"))
    best.coalesce(1).write.mode("overwrite").parquet("/tmp/devq61_spark")
    spark.stop()
  }
}
