package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: q31/q63 cost dissection (VERDICT r8 #2). Both ride
  * operators.Dedup.coShingledPairs; q31 sits at 2.1× and q63 at 2.2× their
  * DuckDB rows with non-floor absolute times. Decompose: shingle
  * materialization, the posting self-join + pair aggregation, and the
  * count-attach joins — and measure whether pre-partitioning the persisted
  * shingle frame by the join key (so the self-join reads co-partitioned
  * cache instead of exchanging both sides) pays.
  */
object DevQ31 {
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
      // without this, InMemoryTableScan reports its pre-cache partitioning
      // even when the cached plan ends in a repartition, so the
      // prepartitioned variant can't skip the self-join exchanges
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        args.drop(1).headOption.getOrElse("false"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.TextOps

    def time(label: String, reps: Int = 5)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[devq31] $label%-28s ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }

    val docs = Tables.documents(spark, sfDir)
    def shRaw = docs.select(col("doc_id"),
      explode(graft.functions.expressions.NativeExprs
        .shingleMd5Prefixes(TextOps.tokens(col("text")), 3, 15)).as("s"))

    // 1. shingle kernel + explode only (no persist, local count)
    time("shingle_explode_only") {
      shRaw.select(count(lit(1)).as("n"))
    }
    // 2. persist-materialize cost: count through the persisted frame
    time("persist_materialize") {
      val p = shRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.select(count(lit(1)).as("n"))
    }
    def q31Of(wc: DataFrame): DataFrame = wc
      .withColumn("jaccard", col("k") * 1.0 / (col("ni") + col("nj") - col("k")))
      .filter(col("jaccard") >= 0.5)
      .select(col("i"), col("j"), round(col("jaccard"), 4).as("jaccard"))
      .orderBy("i", "j")
    // 3. shipped full q31 (coShingledPairs as committed)
    time("shipped_q31") {
      val (wc, _) = graft.operators.Dedup.coShingledPairs(docs, "doc_id", "text")
      q31Of(wc)
    }
    // 4. posting join + pair agg only (no count attach) on the shipped core
    time("pairs_only") {
      val sh = shRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      sh.select(col("doc_id").as("i"), col("s")).hint("shuffle_hash")
        .join(sh.select(col("doc_id").as("j"), col("s")), Seq("s"))
        .filter(col("i") < col("j"))
        .groupBy("i", "j").agg(count(lit(1)).as("k"))
        .select(count(lit(1)).as("n"))
    }
    // 5. pre-partitioned variant: repartition the persisted frame by the
    // join key so InMemoryTableScan's HashPartitioning(s, 8) satisfies the
    // self-join's distribution — no exchange above the cache on either side
    time("prepartitioned_q31") {
      val sh = shRaw.repartition(col("s"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.select(col("doc_id").as("i"), col("s")).hint("shuffle_hash")
        .join(sh.select(col("doc_id").as("j"), col("s")), Seq("s"))
        .filter(col("i") < col("j"))
        .groupBy("i", "j").agg(count(lit(1)).as("k"))
      val wc = inter
        .join(cnt.select(col("doc_id").as("i"), col("n").as("ni"))
          .hint("shuffle_hash"), Seq("i"))
        .join(cnt.select(col("doc_id").as("j"), col("n").as("nj"))
          .hint("shuffle_hash"), Seq("j"))
      q31Of(wc)
    }
    // 6. no-persist variant: the shingle subtree evaluates three times
    // in-plan (both join sides + cnt) but nothing serializes to cache
    time("nopersist_q31") {
      val sh = shRaw
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.select(col("doc_id").as("i"), col("s")).hint("shuffle_hash")
        .join(sh.select(col("doc_id").as("j"), col("s")), Seq("s"))
        .filter(col("i") < col("j"))
        .groupBy("i", "j").agg(count(lit(1)).as("k"))
      val wc = inter
        .join(cnt.select(col("doc_id").as("i"), col("n").as("ni"))
          .hint("shuffle_hash"), Seq("i"))
        .join(cnt.select(col("doc_id").as("j"), col("n").as("nj"))
          .hint("shuffle_hash"), Seq("j"))
      q31Of(wc)
    }
    // 7. broadcast count attach: cnt is DOC-cardinality (5k rows at sf0.1)
    // while the pre-threshold pair set is ~1.1M — the shuffle_hash attach
    // shuffles the pair stream TWICE; broadcasting cnt streams it (DuckDB's
    // own plan shape: build on the small side, probe the pairs)
    time("broadcast_cnt_q31") {
      val sh = shRaw.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.select(col("doc_id").as("i"), col("s")).hint("shuffle_hash")
        .join(sh.select(col("doc_id").as("j"), col("s")), Seq("s"))
        .filter(col("i") < col("j"))
        .groupBy("i", "j").agg(count(lit(1)).as("k"))
      val wc = inter
        .join(broadcast(cnt.select(col("doc_id").as("i"), col("n").as("ni"))), Seq("i"))
        .join(broadcast(cnt.select(col("doc_id").as("j"), col("n").as("nj"))), Seq("j"))
      q31Of(wc)
    }
    // 8. stacked: pre-partitioned persist + broadcast count attach
    time("stacked_q31") {
      val sh = shRaw.repartition(col("s"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val inter = sh.select(col("doc_id").as("i"), col("s")).hint("shuffle_hash")
        .join(sh.select(col("doc_id").as("j"), col("s")), Seq("s"))
        .filter(col("i") < col("j"))
        .groupBy("i", "j").agg(count(lit(1)).as("k"))
      val wc = inter
        .join(broadcast(cnt.select(col("doc_id").as("i"), col("n").as("ni"))), Seq("i"))
        .join(broadcast(cnt.select(col("doc_id").as("j"), col("n").as("nj"))), Seq("j"))
      q31Of(wc)
    }
    // plan check: does the pre-partitioned self-join actually skip the
    // exchanges above the cache scans?
    val shP = shRaw.repartition(col("s"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    shP.count()
    val j = shP.select(col("doc_id").as("i"), col("s")).hint("shuffle_hash")
      .join(shP.select(col("doc_id").as("j"), col("s")), Seq("s"))
      .filter(col("i") < col("j"))
      .groupBy("i", "j").agg(count(lit(1)).as("k"))
    val plan = j.queryExecution.executedPlan.toString
    val nEx = "Exchange".r.findAllIn(plan).length
    println(s"[devq31] prepartitioned self-join plan exchanges: $nEx")
    println(plan.linesIterator.take(40).map("[devq31plan] " + _).mkString("\n"))
    spark.catalog.clearCache()
    spark.stop()
  }
}
