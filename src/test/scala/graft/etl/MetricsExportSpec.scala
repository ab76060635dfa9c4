package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** The observability-export surface (the reference's Grafana-provisioning
  * counterpart): feed append/read-back, latest-per-metric, and the
  * deterministic dashboard descriptor.
  */
class MetricsExportSpec extends SparkSpec {
  import spark.implicits._

  test("metrics feed — runs append, read back, latest wins by run_id") {
    val dir = Files.createTempDirectory("graft_metrics").toString + "/feed"
    MetricsExport.appendRun(spark, dir, "run-0001",
      Map("kept" -> 90L, "droppedDup" -> 10L))
    MetricsExport.appendRun(spark, dir, "run-0002",
      Map("kept" -> 85L, "droppedDup" -> 15L, "droppedContaminated" -> 3L))
    val f = MetricsExport.feed(spark, dir)
    assert(f.count() === 5)
    assert(f.filter($"run_id" === "run-0001").count() === 2)
    val latest = MetricsExport.latest(spark, dir).as[(String, Long)]
      .collect().toMap
    assert(latest === Map("kept" -> 85L, "droppedDup" -> 15L,
      "droppedContaminated" -> 3L))
  }

  test("metrics feed — end to end from the curation pipeline's accounting") {
    import graft.operators.CorpusPipeline
    val dir = Files.createTempDirectory("graft_metrics2").toString + "/feed"
    val docs = graft.Tables.documents(spark, sf0001)
    val res = CorpusPipeline.curate(docs, "doc_id", "text")
    val acct = Map(
      "kept" -> res.corpus.count(),
      "droppedExact" -> res.droppedExact,
      "droppedNearDup" -> res.droppedNearDup,
      "droppedQuality" -> res.droppedQuality,
      "droppedContaminated" -> res.droppedContaminated)
    MetricsExport.appendRun(spark, dir, "run-0001", acct)
    val back = MetricsExport.feed(spark, dir)
      .select("metric", "value").as[(String, Long)].collect().toMap
    assert(back === acct)
    spark.catalog.clearCache()
  }

  test("dashboard descriptor — deterministic, well-formed, one panel per metric") {
    val metrics = Seq("kept", "droppedDup", "droppedContaminated",
      "droppedQuality", "droppedCap")
    val json = MetricsExport.dashboardJson("graft curation", metrics)
    // byte-stable (the provisioning-diff contract)
    assert(json === MetricsExport.dashboardJson("graft curation", metrics))
    // well-formed: Spark's JSON reader parses it with no corrupt column
    val parsed = spark.read.option("mode", "FAILFAST")
      .json(Seq(json).toDS())
    assert(parsed.select(explode(col("panels")).as("p"))
      .select("p.title").as[String].collect().toSeq === metrics)
    assert(parsed.select("title").as[String].head() === "graft curation")
    // escaping: quotes/control chars in titles can't break the document
    val hostile = MetricsExport.dashboardJson("a\"b\\c\nd", Seq("m\"x"))
    val p2 = spark.read.option("mode", "FAILFAST").json(Seq(hostile).toDS())
    assert(p2.select("title").as[String].head() === "a\"b\\c\nd")
    // file write round-trips
    val path = Files.createTempDirectory("graft_dash").toString + "/dash.json"
    MetricsExport.writeDashboard(path, "t", metrics)
    assert(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8") ===
      MetricsExport.dashboardJson("t", metrics))
  }
}
