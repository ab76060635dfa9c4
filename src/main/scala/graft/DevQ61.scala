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
  /** The kernel's anchor struct shape, for the r14 literal-codebook
    * candidate (field names must match BestAnchor's expected input).
    */
  case class DevAnchor(anchor_id: Long, av: Seq[Float], an: Double)

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
    // r14 candidate (VERDICT r13 #1): fold the codebook into a LITERAL —
    // one bounded 256-row collect replaces the broadcast-subquery job,
    // the 1-row collect_list aggregate stage and the crossJoin; the main
    // pass is then a single scan+project+tiny-agg plan. Bounded-collect
    // class (K is constant by design — the HeavyHitters ≤m rule).
    def litCodebookForm(k: Int): DataFrame = {
      import graft.functions.expressions.NativeExprs
      val anchors = emb.orderBy("vec_id").limit(k)
        .select(col("vec_id").cast(LongType).as("anchor_id"), col("embedding"))
        .collect()
        .map { r =>
          val av = r.getSeq[Float](1)
          // same accumulation order as VectorOps.dot (left-to-right
          // double sum) so the norm is bit-identical to the shipped form
          var s = 0.0
          av.foreach(x => s += x.toDouble * x.toDouble)
          DevAnchor(r.getLong(0), av, math.sqrt(s))
        }.sortBy(_.anchor_id).toSeq
      emb.select(col("vec_id"),
          NativeExprs.bestAnchor(col("embedding"), typedLit(anchors)).as("b"))
        .select(col("b.anchor_id").as("cluster"),
          round(col("b.score") * 10000, 0).cast(LongType).as("si"))
        .groupBy("cluster")
        .agg(count(lit(1)).as("n"), sum(col("si")).as("ssum"),
          min(col("si")).as("smin"))
        .select(col("cluster"), col("n"),
          (when(col("ssum") >= 0, expr("(2 * ssum + n) div (2 * n)"))
            .otherwise(-expr("(2 * -ssum + n) div (2 * n)")) / 10000.0)
            .as("avg_score"),
          (col("smin") / 10000.0).as("min_score"))
        .orderBy("cluster")
    }
    val ref = SparkEntry.queries("q61_cluster_profile")(spark, sfDir)
      .collect().map(_.toString).sorted
    val lit256 = litCodebookForm(256).collect().map(_.toString).sorted
    println(s"[devq61] parity lit-codebook vs declared: ${
      if (lit256.sameElements(ref)) "OK" else "MISMATCH"}")

    time("full_q61_K256", SparkEntry.queries("q61_cluster_profile")(spark, sfDir))
    time("lit_codebook_K256", litCodebookForm(256))
    time("scoring_only_K256", scored(256))
    time("scoring_only_K16", scored(16))
    time("scan_only", emb.select(col("vec_id"),
      sqrt(VectorOps.dot(col("embedding"), col("embedding"))).as("en")))
    time("full_q61_K256", SparkEntry.queries("q61_cluster_profile")(spark, sfDir))
    time("lit_codebook_K256", litCodebookForm(256))
    spark.stop()
  }
}
