package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Source/sink caps (SURVEY §2.2 scans row): CSV and Parquet round-trips,
  * partitioned writes with partition pruning, and binaryFile (binaryFile
  * ingest itself is covered in MultimodalSpec/PipelineSpec).
  */
class SourcesSinksSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("parquet round-trip — bit-identical rows and schema") {
    val dir = tmp("graft_pq")
    val src = Tables.orders(spark, sf0001)
    src.write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.schema === src.schema)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("csv round-trip with explicit schema (header, typed read-back)") {
    val dir = tmp("graft_csv")
    val src = Tables.nation(spark, sf0001)
    src.write.mode("overwrite").option("header", "true").csv(dir)
    val back = spark.read.schema(src.schema).option("header", "true").csv(dir)
    assert(back.exceptAll(src).isEmpty && src.exceptAll(back).isEmpty)
  }

  test("partitioned write — layout + partition pruning in the plan") {
    val dir = tmp("graft_part")
    Tables.orders(spark, sf0001)
      .withColumn("status", $"o_orderstatus")
      .write.mode("overwrite").partitionBy("status").parquet(dir)
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory)
      .map(_.getName).sorted
    assert(dirs.exists(_.startsWith("status=")))
    val pruned = spark.read.parquet(dir).filter($"status" === "F")
    val scan = pruned.queryExecution.executedPlan.toString
    // partition filter must reach the scan (pruned directories, not rows)
    assert(scan.contains("PartitionFilters: [isnotnull(status"), scan)
    val want = Tables.orders(spark, sf0001).filter($"o_orderstatus" === "F").count()
    assert(pruned.count() === want)
  }

  test("predicate pushdown + column pruning reach the parquet scan (Q1 contract)") {
    val plan = Tables.lineitem(spark, sf0001)
      .filter($"l_quantity" > 10)
      .select("l_orderkey", "l_quantity")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,10.0)]"), plan)
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"), plan)
  }

  test("json sink preserves nested structs (document contract)") {
    val dir = tmp("graft_json")
    val docs = Seq(("t", "1998", "u", "2026-08-12", "CassationDecision"))
      .toDF("title", "year", "sourceURL", "dateIngested", "category")
      .withColumn("tags", array(lit("CassationDecision")))
      .withColumn("content", lit("body"))
      .withColumn("caseFields", struct(lit("i").as("issue"), lit("h").as("holding"),
        lit("r").as("ratio")))
      .withColumn("legisFields", struct(lit("s").as("scope"),
        array(lit("a1")).as("keyArticles"), lit("").as("effectiveDate")))
      .withColumn("templateFields", struct(array(lit("p")).as("placeholders")))
    docs.write.mode("overwrite").json(dir)
    val back = spark.read.schema(Tables.legalDocSchema).json(dir)
    assert(back.count() === 1)
    assert(back.select($"caseFields.holding").as[String].head() === "h")
    assert(back.select($"legisFields.keyArticles").as[Seq[String]].head() === Seq("a1"))
  }
}
