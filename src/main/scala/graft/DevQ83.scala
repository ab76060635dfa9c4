package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only: q83_lsh_md5 stage dissection (round 9 — the 7.4 s bench
  * reading vs DuckDB's 1.5 s). Times each stage of the pipeline under
  * bench-identical conf to localize where the time goes: shingle-array
  * build, the md5 signature (HOF vs compiled kernel), banding + the
  * candidate self-join, and the exact-verify tail.
  */
object DevQ83 {
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
    import graft.functions.TextOps
    import graft.functions.expressions.NativeExprs

    def time(tag: String)(f: => Long): Unit = {
      (1 to 3).foreach { r =>
        val t0 = System.nanoTime()
        val n = f
        println(f"[devq83] $tag rep$r: ${(System.nanoTime() - t0) / 1e9}%.3f s (n=$n)")
      }
    }

    val docs = Tables.documents(spark, sfDir)
    val toks = docs.select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    def shArrDf = toks.select(col("doc_id"),
        when(size(col("toks")) < 3, array().cast(ArrayType(StringType)))
          .otherwise(expr(
            "array_distinct(transform(sequence(1, size(toks) - 2), " +
              "i -> concat(toks[i-1], ' ', toks[i], ' ', toks[i+1])))"))
          .as("shs"))
      .filter(size(col("shs")) > 0)

    def shArrKernelDf = toks.select(col("doc_id"),
        array_distinct(NativeExprs.shingles(col("toks"), 3)).as("shs"))
      .filter(size(col("shs")) > 0)

    // NB: count(sig) on a NON-NULLABLE expression is rewritten to count(1)
    // and the whole projection prunes away — force evaluation by consuming
    // a value derived from the array (the first dissection's sig rows were
    // all measuring the shArr build alone)
    time("shArr build HOF (no persist)") {
      shArrDf.select(sum(size(col("shs")))).head().getLong(0)
    }
    time("shArr build kernel (no persist)") {
      shArrKernelDf.select(sum(size(col("shs")))).head().getLong(0)
    }
    time("shArr + sig kernel (forced)") {
      shArrKernelDf.select(col("doc_id"),
          NativeExprs.lshMinSig(col("shs"), 16).as("sig"))
        .select(sum(length(element_at(col("sig"), 1)))).head().getLong(0)
    }
    time("shArr + sig HOF (forced)") {
      shArrKernelDf.select(col("doc_id"),
        expr("transform(sequence(0, 15), " +
          "p -> array_min(transform(shs, s -> md5(concat(cast(p as string), ':', s)))))")
          .as("sig"))
        .select(sum(length(element_at(col("sig"), 1)))).head().getLong(0)
    }
    time("full q83 (shipped)") {
      queries.Catalog.byName("q83_lsh_md5").build(spark, sfDir).count()
    }
    spark.catalog.clearCache()
    time("full q83 (fresh cache)") {
      val n = queries.Catalog.byName("q83_lsh_md5").build(spark, sfDir).count()
      spark.catalog.clearCache()
      n
    }
    spark.stop()
  }
}
