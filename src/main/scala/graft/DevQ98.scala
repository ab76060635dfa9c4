package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev-only: q98_session_itemsets dissection (VERDICT r13 item 1). The
  * shipped form materializes the session type-set frame (one user-keyed
  * exchange + window) into a persist, then reads it THREE times (session
  * count, per-type counts, pair counts) — three extra job launches and
  * three tiny exchanges over a 0.17 s DuckDB denominator. The candidate
  * collapses the fan-out into ONE pass: each session's local expansion
  * emits tagged rows (one 'ns' marker, one 'ta' row per type, one 'ab'
  * row per pair), a single map-side-combinable groupBy reduces them to a
  * ≤ 1+T+T²-row table, and the final assembly self-joins that tiny frame
  * — the heavy data crosses exactly one exchange, the persist and the
  * repeated reads disappear.
  */
object DevQ98 {
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

    def declared = SparkEntry.queries("q98_session_itemsets")(spark, sfDir)

    def onePassForm: DataFrame = {
      val gapUs = 1800000000L
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val sess = Tables.events(spark, sfDir)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
        .withColumn("prev", lag(col("us"), 1).over(w))
        .withColumn("brk",
          when(col("prev").isNull || col("us") - col("prev") > gapUs, 1L)
            .otherwise(0L))
        .withColumn("sid", sum(col("brk"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(sort_array(collect_set(col("event_type"))).as("tys"))
      // tagged local expansion: 'ns' marker + per-type + per-pair rows,
      // all from the ≤#types session array — then ONE tiny aggregation
      val tagged = sess.select(explode(expr(
        """concat(
          |  array(named_struct('kind', 'ns', 'a', '', 'b', '')),
          |  transform(tys, t -> named_struct('kind', 'ta', 'a', t, 'b', '')),
          |  flatten(transform(tys, t -> transform(filter(tys, u -> u > t),
          |    u -> named_struct('kind', 'ab', 'a', t, 'b', u)))))""".stripMargin))
        .as("r"))
        .groupBy(col("r.kind").as("kind"), col("r.a").as("a"), col("r.b").as("b"))
        .agg(count(lit(1)).as("c"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ns = tagged.filter(col("kind") === "ns").select(col("c").as("ns"))
      val ta = tagged.filter(col("kind") === "ta")
        .select(col("a").as("event_type"), col("c").as("na"))
      val pr = tagged.filter(col("kind") === "ab")
        .select(col("a").as("type_a"), col("b").as("type_b"), col("c").as("n_ab"))
      pr.crossJoin(ns)
        .join(broadcast(ta.select(col("event_type").as("type_a"),
          col("na").as("na_a"))), Seq("type_a"))
        .join(broadcast(ta.select(col("event_type").as("type_b"),
          col("na").as("na_b"))), Seq("type_b"))
        .select(col("type_a"), col("type_b"), col("n_ab"),
          expr("(2 * 10000 * n_ab + ns) div (2 * ns)").as("support_e4"),
          expr("(2 * 10000 * ns * n_ab + na_a * na_b) div (2 * na_a * na_b)")
            .as("lift_e4"))
        .orderBy("type_a", "type_b")
    }

    val ref = declared.collect().map(_.toString).sorted
    spark.catalog.clearCache()
    val got = onePassForm.collect().map(_.toString).sorted
    spark.catalog.clearCache()
    println(s"[q98] parity one-pass vs declared: ${if (got.sameElements(ref)) "OK" else "MISMATCH"}")

    def time(tag: String)(f: => DataFrame): Unit = {
      val raw = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        val s = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        s
      }
      val ts = raw.sorted
      println(f"[q98] $tag%-14s median=${ts(2)}%6.3f reps=" +
        raw.map(t => f"$t%.3f").mkString(" "))
    }
    time("declared")(declared)
    time("one-pass")(onePassForm)
    time("declared")(declared)
    time("one-pass")(onePassForm)
    spark.stop()
  }
}
