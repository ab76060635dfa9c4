package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev-only HISTORICAL dissection record: q89_minhash_estimate (round 9,
  * session 3 — the 2.31 s window-8 reading vs DuckDB's 0.91 s row). The
  * THEN-shipped plan posexploded each participant signature into 16
  * (p, mh) rows, persisted the exploded frame, joined the pair set into
  * it twice and re-aggregated agreement with a groupBy — four extra
  * barriers over the pair core. `arrayVariant` below is the measured
  * winner (2.0–2.7 → 1.6–2.0 s fresh-cache, exact row parity) and was
  * ADOPTED as `Curation.minhashEstimate` the same session — running this
  * harness today therefore compares the shipped form against itself; the
  * numbers in BASELINE.md's ledger are the pre-adoption measurements.
  */
object DevQ89 {
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
        println(f"[devq89] $tag rep$r: ${(System.nanoTime() - t0) / 1e9}%.3f s (n=$n)")
      }
    }

    val docs = Tables.documents(spark, sfDir)

    time("pair core only (fresh cache)") {
      val (wc, _) = operators.Dedup.coShingledPairs(docs, "doc_id", "text")
      val n = wc.filter(col("k") * 1.0 / (col("ni") + col("nj") - col("k")) >= 0.5)
        .count()
      spark.catalog.clearCache(); n
    }

    // candidate: array-shaped signatures, zip_with agreement, no explode
    def arrayVariant(nPerms: Int = 16): DataFrame = {
      val (wc, _) = operators.Dedup.coShingledPairs(docs, "doc_id", "text")
      val pairs = wc
        .filter(col("k") * 1.0 / (col("ni") + col("nj") - col("k")) >= 0.5)
        .select(col("i"), col("j"),
          expr("(2 * 10000 * k + (ni + nj - k)) div (2 * (ni + nj - k))")
            .as("jac_e4"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ids = pairs.select(col("i").as("doc_id"))
        .union(pairs.select(col("j").as("doc_id"))).distinct()
      val sigs = docs.join(ids, Seq("doc_id"), "leftsemi")
        .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
        .select(col("doc_id"),
          array_distinct(NativeExprs.shingles(col("toks"), 3)).as("shs"))
        .filter(size(col("shs")) > 0)
        .select(col("doc_id"), NativeExprs.lshMinSig(col("shs"), nPerms).as("sig"))
      val withSi = sigs.select(col("doc_id").as("i"), col("sig").as("si"))
        .join(broadcast(pairs), Seq("i"))
      val agree = broadcast(withSi)
        .join(sigs.select(col("doc_id").as("j"), col("sig").as("sj")), Seq("j"))
        .withColumn("m", expr("aggregate(zip_with(si, sj, " +
          "(x, y) -> CASE WHEN x = y THEN 1 ELSE 0 END), 0L, (a, b) -> a + b)"))
      agree.select(col("i"), col("j"),
          expr(s"(2 * 10000 * m + $nPerms) div (2 * $nPerms)").as("est_e4"),
          col("jac_e4"),
          abs(expr(s"(2 * 10000 * m + $nPerms) div (2 * $nPerms)") -
            col("jac_e4")).as("err_e4"))
        .orderBy("i", "j")
    }

    time("full q89 (shipped, fresh cache)") {
      val n = queries.Catalog.byName("q89_minhash_estimate")
        .build(spark, sfDir).count()
      spark.catalog.clearCache(); n
    }
    time("full q89 (array variant, fresh cache)") {
      val n = arrayVariant().count()
      spark.catalog.clearCache(); n
    }
    // parity: identical rows in identical order
    val shipped = queries.Catalog.byName("q89_minhash_estimate")
      .build(spark, sfDir).collect().map(_.toString)
    spark.catalog.clearCache()
    val variant = arrayVariant().collect().map(_.toString)
    spark.catalog.clearCache()
    println(s"[devq89] parity: shipped=${shipped.length} variant=${variant.length} " +
      s"equal=${shipped.sameElements(variant)}")
    spark.stop()
  }
}
