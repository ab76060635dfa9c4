package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.TextOps
import graft.functions.expressions.NativeExprs

/** Dev-only: compare q54 dup-span formulations under bench-identical conf.
  *
  * (a) declared: spans evaluated twice (agg branch + join probe) + a third
  *     shingleStats pass for per-doc totals;
  * (b) window: spans evaluated ONCE — count(*) over (partition by sh)
  *     attaches the global span frequency, then one per-doc aggregate;
  * (c) persist: spans cached as narrow (doc_id, sh) pairs, join shape kept.
  */
object DevQ54 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.files.maxPartitionBytes", "16m")
      .config("spark.sql.files.openCostInBytes", "64k")
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def docs = Tables.documents(spark, sfDir)
    def spans = docs.select(col("doc_id"),
      explode(NativeExprs.shingleMd5Prefixes(TextOps.tokens(col("text")), 5, 15)).as("sh"))

    def declared = SparkEntry.queries("q54_dup_spans")(spark, sfDir)

    def windowForm = {
      val perDoc = spans
        .withColumn("ndocs", count(lit(1)).over(Window.partitionBy("sh")))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("nt"),
             sum(when(col("ndocs") >= 2, 1L).otherwise(0L)).as("nd"))
      val nd = coalesce(col("nd"), lit(0L))
      val nt = coalesce(col("nt"), lit(0L))
      docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
        .select(col("doc_id"),
          nd.cast(LongType).as("n_dup_spans"),
          nt.cast(LongType).as("n_spans"),
          round(when(nt > 0, nd * 1.0 / nt).otherwise(0.0), 4).as("dup_frac"))
        .orderBy("doc_id")
    }

    def persistForm = {
      val sp = spans.persist()
      val shared = sp.groupBy("sh").agg(count(lit(1)).as("ndocs"))
        .filter(col("ndocs") >= 2).select("sh")
      val perDoc = sp.join(shared.hint("shuffle_hash"), Seq("sh"))
        .groupBy("doc_id").agg(count(lit(1)).as("nd"))
      val tot = sp.groupBy("doc_id").agg(count(lit(1)).as("nt"))
      val nd = coalesce(col("nd"), lit(0L))
      val nt = coalesce(col("nt"), lit(0L))
      docs.select("doc_id")
        .join(perDoc, Seq("doc_id"), "left")
        .join(tot, Seq("doc_id"), "left")
        .select(col("doc_id"),
          nd.cast(LongType).as("n_dup_spans"),
          nt.cast(LongType).as("n_spans"),
          round(when(nt > 0, nd * 1.0 / nt).otherwise(0.0), 4).as("dup_frac"))
        .orderBy("doc_id")
    }

    def time(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        s
      }.sorted
      println(f"[q54] $tag%-18s median=${ts(2)}%6.3f min=${ts.head}%6.3f max=${ts.last}%6.3f")
    }

    // parity check first (window + persist vs declared)
    val ref = declared.collect().map(_.toString).sorted
    Seq("window" -> windowForm, "persist" -> persistForm).foreach { case (tag, df) =>
      val got = df.collect().map(_.toString).sorted
      println(s"[q54] parity $tag vs declared: ${if (got.sameElements(ref)) "OK" else "MISMATCH"}")
      spark.catalog.clearCache()
    }

    time("declared")(declared)
    time("window")(windowForm)
    time("persist")(persistForm)
    time("declared")(declared)
    spark.stop()
  }
}
