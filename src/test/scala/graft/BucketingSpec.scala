package graft

import org.apache.spark.sql.functions._

/** Bucketing — the co-located join path for repeated big⋈big joins at scale
  * (SURVEY mandate: "bucketing for co-located joins"). Writing both sides
  * bucketed on the join key lets the join run with ZERO exchanges: each task
  * reads matching bucket files from both tables. At 100 TB this converts the
  * dominant recurring shuffle into a one-time write-side cost.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle; result matches the shuffled join") {
    // warehouse dir is a temp dir set statically in SparkSpec
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_customer")
    Tables.orders(spark, sf0001)
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.customer(spark, sf0001)
      .write.bucketBy(8, "c_custkey").sortBy("c_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    val joined = spark.table("b_orders")
      .join(spark.table("b_customer"), $"o_custkey" === $"c_custkey")
      .groupBy("c_custkey").agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("rev"))
    // disable broadcast so the test exercises the co-located SMJ path, not a
    // broadcast that would hide the exchange question entirely
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      // no Exchange between the scans and the join: bucket layout satisfies
      // the join's distribution requirement on both sides
      val joinIdx = plan.indexOf("SortMergeJoin")
      assert(joinIdx >= 0, plan)
      val belowJoin = plan.substring(joinIdx)
      assert(!belowJoin.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), plan)
      // and values equal the plain shuffled join
      val plain = Tables.orders(spark, sf0001)
        .join(Tables.customer(spark, sf0001), $"o_custkey" === $"c_custkey")
        .groupBy("c_custkey").agg(count(lit(1)).as("n"),
          sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("rev"))
      assert(joined.exceptAll(plain).isEmpty && plain.exceptAll(joined).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
