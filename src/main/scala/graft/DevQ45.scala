package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.expressions.NativeExprs

/** Dev-only: q45 tf-idf — aggregate+join df attach vs token-window df
  * attach (the DevQ54 result suggested the same single-evaluation win). */
object DevQ45 {
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
    def declared = SparkEntry.queries("q45_tfidf")(spark, sfDir)

    def windowForm = {
      val tf = docs.select(col("doc_id"),
          explode(NativeExprs.tokenCounts(col("text"))).as("tc"))
        .select(col("doc_id"), col("tc.token").as("token"),
                col("tc.tf").cast(LongType).as("tf"))
      val n = docs.agg(count(lit(1)).as("n"))
      val sc = tf
        .withColumn("df", count(lit(1)).over(Window.partitionBy("token")))
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("token"),
          round(col("tf") * log(col("n") * lit(1.0) / col("df")), 4).as("score"))
      graft.operators.TopK.perGroup(sc, Seq("doc_id"), "score", "token", 3)
        .select(col("doc_id"), col("rnk"), col("token"), col("score"))
        .orderBy("doc_id", "rnk")
    }

    // r13 candidate (the q57 lesson applied): df via groupBy(token)
    // aggregate (map-side combined, vocabulary-cardinality result) and a
    // shuffle_hash join with the REDUCED df table as build side — the tf
    // stream shuffles by token HASH with no per-partition sort. Costs a
    // second tokenCounts scan (the df branch); the r7 window form chose
    // the single evaluation + sort instead. Which wins depends on
    // sort-vs-rescan economics.
    def aggJoinForm = {
      def tf = docs.select(col("doc_id"),
          explode(NativeExprs.tokenCounts(col("text"))).as("tc"))
        .select(col("doc_id"), col("tc.token").as("token"),
                col("tc.tf").cast(LongType).as("tf"))
      val n = docs.agg(count(lit(1)).as("n"))
      val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val sc = tf
        .join(df.hint("shuffle_hash"), Seq("token"))
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("token"),
          round(col("tf") * log(col("n") * lit(1.0) / col("df")), 4).as("score"))
      graft.operators.TopK.perGroup(sc, Seq("doc_id"), "score", "token", 3)
        .select(col("doc_id"), col("rnk"), col("token"), col("score"))
        .orderBy("doc_id", "rnk")
    }

    // r14 candidate (VERDICT r13 #1): the aggJoin economics WITHOUT the
    // second tokenCounts scan — persist the (doc, token, tf) frame, so
    // the df aggregate and the join probe read one materialization; the
    // tf stream still shuffles by token hash exactly once (unsorted),
    // plus the reduced-df exchange.
    def aggJoinPersistForm = {
      val tf = docs.select(col("doc_id"),
          explode(NativeExprs.tokenCounts(col("text"))).as("tc"))
        .select(col("doc_id"), col("tc.token").as("token"),
                col("tc.tf").cast(LongType).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val n = docs.agg(count(lit(1)).as("n"))
      val df = tf.groupBy("token").agg(count(lit(1)).as("df"))
      val sc = tf
        .join(df.hint("shuffle_hash"), Seq("token"))
        .crossJoin(broadcast(n))
        .select(col("doc_id"), col("token"),
          round(col("tf") * log(col("n") * lit(1.0) / col("df")), 4).as("score"))
      graft.operators.TopK.perGroup(sc, Seq("doc_id"), "score", "token", 3)
        .select(col("doc_id"), col("rnk"), col("token"), col("score"))
        .orderBy("doc_id", "rnk")
    }

    val ref = declared.collect().map(_.toString).sorted
    val got = windowForm.collect().map(_.toString).sorted
    println(s"[q45] parity window vs declared: ${if (got.sameElements(ref)) "OK" else "MISMATCH"}")
    val got2 = aggJoinForm.collect().map(_.toString).sorted
    println(s"[q45] parity aggjoin vs declared: ${if (got2.sameElements(ref)) "OK" else "MISMATCH"}")
    val got3 = aggJoinPersistForm.collect().map(_.toString).sorted
    spark.catalog.clearCache()
    println(s"[q45] parity aggjoin+persist vs declared: ${if (got3.sameElements(ref)) "OK" else "MISMATCH"}")

    def time(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val raw = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        s
      }
      val ts = raw.sorted
      println(f"[q45] $tag%-18s median=${ts(2)}%6.3f reps=" +
        raw.map(t => f"$t%.3f").mkString(" "))
    }
    time("declared")(declared)
    time("window")(windowForm)
    time("aggjoin")(aggJoinForm)
    time("aggjoin+persist")(aggJoinPersistForm)
    time("declared")(declared)
    time("window")(windowForm)
    time("aggjoin")(aggJoinForm)
    time("aggjoin+persist")(aggJoinPersistForm)
    spark.stop()
  }
}
