package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: dissect q11_range_join's cost on the round-8 corpus (events.ts
  * now TIMESTAMP(MICROS) → read as NTZ and cast, where rounds 1–7 read raw
  * nanos longs). Times each pipeline stage and a no-cast variant to locate
  * the regression vs the 0.335 s ledger row.
  */
object DevQ11 {
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

    def time(label: String, reps: Int = 5)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[devq11] $label%-28s ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }

    val W = 300000000L

    // stage 1: bare scan of events via Tables (cast path)
    time("scan_tables_events") {
      Tables.events(spark, sfDir).select("user_id", "ts")
    }
    // stage 1b: raw scan, ts kept NTZ
    time("scan_raw_ntz") {
      spark.read.parquet(s"$sfDir/events.parquet").select("user_id", "ts")
    }
    // stage 2: bucket + explode, no join
    time("explode_no_join") {
      Tables.events(spark, sfDir)
        .select(col("user_id"), col("ts").as("ts1"),
          expr(s"unix_micros(ts) div $W").as("b1"))
        .withColumn("bkt", explode(array(col("b1"), col("b1") + 1)))
        .groupBy("user_id").agg(count(lit(1)).as("n"))
    }
    // stage 3: full q11 as shipped
    time("full_q11") {
      queries.Catalog.byName("q11_range_join").build(spark, sfDir)
    }
    // stage 5: long-domain band residual (no timestamp arithmetic at all;
    // NTZ µs extracted via a long cast, valid under the UTC session tz)
    time("full_long_band") {
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      val base = raw.select(col("user_id"),
        col("ts").cast("timestamp").cast("long").as("s"),
        expr("unix_micros(cast(ts as timestamp))").as("us"))
        .drop("s")
      val e1 = base.select(col("user_id"), col("us").as("us1"),
          (col("us") / lit(W)).cast("long").as("b1"))
        .withColumn("bkt", explode(array(col("b1"), col("b1") + 1)))
        .drop("b1")
      val e2 = base.select(col("user_id").as("uid2"), col("us").as("us2"),
          (col("us") / lit(W)).cast("long").as("bkt"))
      e1.join(e2, col("user_id") === col("uid2") &&
          e1("bkt") === e2("bkt") &&
          col("us2") > col("us1") && col("us2") <= col("us1") + lit(W))
        .groupBy(col("user_id")).agg(count(lit(1)).as("pairs"))
        .orderBy("user_id")
    }
    spark.stop()
  }
}
