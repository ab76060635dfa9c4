package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only: q97 point-in-time features dissection (round 13 — the
  * 3.2× row in the r13 re-baseline). The shipped form computes
  * last-within-day with a row_number window: a FULL SORT of the event
  * stream by (user, day, us desc, event_id desc) on one exchange. The
  * candidate replaces it with a max_by hash AGGREGATE on struct(us,
  * event_id) — map-side combinable, so only (user, day)-grain partials
  * shuffle and nothing event-grain is ever sorted; the grid bounds then
  * derive from the REDUCED (user, day) table instead of re-reading the
  * event cache. (us, event_id) is a total order (event_id unique), so
  * max_by is deterministic — same tie story as the window's two-key
  * ORDER BY.
  */
object DevQ97 {
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

    def declared = SparkEntry.queries("q97_pit_features")(spark, sfDir)

    def aggForm = {
      val e = Tables.events(spark, sfDir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          col("event_id"), col("value"))
      // ONE map-side-combinable aggregate replaces the event-grain sort;
      // (us, event_id) totally ordered -> deterministic last-within-day
      val lastPerDay = e.groupBy("user_id", "day")
        .agg(max_by(col("value"), struct(col("us"), col("event_id")))
          .as("value"))
      val grid = lastPerDay.groupBy("user_id").agg(min(col("day")).as("mn"))
        .crossJoin(broadcast(lastPerDay.agg(max(col("day")).as("mx"))))
        .select(col("user_id"),
          explode(sequence(col("mn"), col("mx"))).as("day"))
      val fill = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(lastPerDay, Seq("user_id", "day"), "left")
        .withColumn("last_val",
          last(col("value"), ignoreNulls = true).over(fill))
        .filter(col("last_val").isNotNull)
        .select(col("user_id"), col("day"), col("last_val"))
        .orderBy("user_id", "day")
    }

    val ref = declared.collect().map(_.toString).sorted
    val got = aggForm.collect().map(_.toString).sorted
    println(s"[q97] parity agg vs declared: ${if (got.sameElements(ref)) "OK" else "MISMATCH"}")

    def time(tag: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      val ts = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        s
      }.sorted
      println(f"[q97] $tag%-12s median=${ts(2)}%6.3f min=${ts.head}%6.3f max=${ts.last}%6.3f")
    }
    def aggFormPersist = {
      val e = Tables.events(spark, sfDir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          col("event_id"), col("value"))
      val lastPerDay = e.groupBy("user_id", "day")
        .agg(max_by(col("value"), struct(col("us"), col("event_id")))
          .as("value"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val grid = lastPerDay.groupBy("user_id").agg(min(col("day")).as("mn"))
        .crossJoin(broadcast(lastPerDay.agg(max(col("day")).as("mx"))))
        .select(col("user_id"),
          explode(sequence(col("mn"), col("mx"))).as("day"))
      val fill = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(lastPerDay, Seq("user_id", "day"), "left")
        .withColumn("last_val",
          last(col("value"), ignoreNulls = true).over(fill))
        .filter(col("last_val").isNotNull)
        .select(col("user_id"), col("day"), col("last_val"))
        .orderBy("user_id", "day")
    }
    val got3 = aggFormPersist.collect().map(_.toString).sorted
    spark.catalog.clearCache()
    println(s"[q97] parity aggpersist vs declared: ${if (got3.sameElements(ref)) "OK" else "MISMATCH"}")

    // r14 candidate — PARTITION REUSE over the reduced table: repartition
    // lastPerDay by user_id ONLY before the persist. HashPartitioning(u)
    // satisfies every downstream clustering by the subset rule — the grid
    // min aggregate, the (user, day) equi join (both sides user-keyed →
    // co-partitioned), and the forward-fill window (local sort only) —
    // so the grid/join/window tail runs with ZERO further exchanges. The
    // big exchange stays the map-side-combined (user, day) partial — the
    // scale-right term is untouched; only small-table barriers collapse.
    def partitionReuseForm = {
      val e = Tables.events(spark, sfDir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          expr("unix_micros(ts) div 86400000000").as("day"),
          col("event_id"), col("value"))
      val lastPerDay = e.groupBy("user_id", "day")
        .agg(max_by(col("value"), struct(col("us"), col("event_id")))
          .as("value"))
        .repartition(col("user_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val grid = lastPerDay.groupBy("user_id").agg(min(col("day")).as("mn"))
        .crossJoin(broadcast(lastPerDay.agg(max(col("day")).as("mx"))))
        .select(col("user_id"),
          explode(sequence(col("mn"), col("mx"))).as("day"))
      val fill = Window.partitionBy("user_id").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.join(lastPerDay.hint("shuffle_hash"), Seq("user_id", "day"), "left")
        .withColumn("last_val",
          last(col("value"), ignoreNulls = true).over(fill))
        .filter(col("last_val").isNotNull)
        .select(col("user_id"), col("day"), col("last_val"))
        .orderBy("user_id", "day")
    }
    val got4 = partitionReuseForm.collect().map(_.toString).sorted
    spark.catalog.clearCache()
    println(s"[q97] parity partition-reuse vs declared: ${if (got4.sameElements(ref)) "OK" else "MISMATCH"}")

    time("declared")(declared)
    time("aggform")(aggForm)
    time("aggpersist")(aggFormPersist)
    time("part-reuse")(partitionReuseForm)
    time("declared")(declared)
    time("aggform")(aggForm)
    time("aggpersist")(aggFormPersist)
    time("part-reuse")(partitionReuseForm)
    spark.stop()
  }
}
