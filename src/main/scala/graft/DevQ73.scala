package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: q73_span_ladder cost dissection. The query is 6.3× its DuckDB
  * row in the parity window — find whether the exploded (span_len, digest)
  * exchange, the kernel pass, or the aggregation dominates, and whether
  * packing the pair into ONE long (3 level bits ⊕ 60-bit digest) pays.
  */
object DevQ73 {
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

    def time(label: String, reps: Int = 5)(mk: => DataFrame): Unit = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        mk.write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[devq73] $label%-24s ${ts.map(t => f"$t%.3f").mkString(" ")}")
    }

    val docs = Tables.documents(spark, sfDir)
    def spans = docs.select(explode(NativeExprs
        .spanDigestLadder(TextOps.tokens(col("text")), 6)).as("sd"))
      .select(col("sd.span_len").as("span_len"), col("sd.digest").as("digest"))

    // 1. kernel + explode only, no exchange (local count)
    time("kernel_explode_only") {
      spans.select(count(lit(1)).as("n"))
    }
    // 2. shipped form: groupBy (span_len, digest)
    time("shipped_two_col") {
      spans.groupBy("span_len", "digest").agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2)
        .groupBy("span_len")
        .agg(count(lit(1)).as("n_spans"), sum(col("c")).as("n_positions"))
    }
    // 3. packed single-long key: LEVEL (log2 of the 2..64 width, 3 bits) in
    // the top bits over the digest TRUNCATED to 61 bits — the first cut of
    // this variant packed the raw width over the full 64-bit digest, which
    // overflows for widths >= 16 and collides groups across levels (review
    // finding); truncation keeps the q31 collision-tolerance class for
    // timing purposes
    time("packed_one_col") {
      spans.select((shiftleft(
            expr("cast(log2(span_len) as long)"), 61)
          .bitwiseOR(col("digest").bitwiseAND(lit((1L << 61) - 1)))).as("k"))
        .groupBy("k").agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2)
        .groupBy(shiftright(col("k"), 61).as("lvl"))
        .agg(count(lit(1)).as("n_spans"), sum(col("c")).as("n_positions"))
    }
    // 4. partial-agg width check: pre-aggregate per partition first
    time("two_phase_manual") {
      spans.repartition(8, col("digest"))
        .groupBy("span_len", "digest").agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2)
        .groupBy("span_len")
        .agg(count(lit(1)).as("n_spans"), sum(col("c")).as("n_positions"))
    }
    // 5. round-9: the KERNEL-NATIVE packed form — SpanLadderPackedExpr
    // emits a primitive long array (level tag in bits 61..63 over the
    // 61-bit-truncated digest) from a codegen'd scan, so the explode
    // carries 8 unboxed bytes per span and the group key is ONE long.
    // Variant 3 above still paid the struct explode + a repacking
    // projection; this one never builds a struct at all.
    def packed = docs.select(explode(NativeExprs
        .spanDigestLadderPacked(TextOps.tokens(col("text")), 6)).as("pk"))
    time("packed_kernel_explode") {
      packed.select(count(lit(1)).as("n"))
    }
    time("packed_kernel_full") {
      packed.groupBy("pk").agg(count(lit(1)).as("c"))
        .filter(col("c") >= 2)
        .groupBy(expr("cast(shiftleft(1, cast(shiftrightunsigned(pk, 61) as int)) as int)")
          .as("span_len"))
        .agg(count(lit(1)).as("n_spans"), sum(col("c")).as("n_positions"))
    }
    spark.stop()
  }
}
