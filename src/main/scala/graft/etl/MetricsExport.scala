package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Observability export — the engine-side counterpart of the reference's
  * dashboard provisioning workflow (reference:
  * `.github/workflows/provision_grafana.yml`, which provisions a Grafana
  * dashboard over the ingest job's metrics). The engine's equivalent
  * surface has two halves:
  *
  *  1. a durable METRICS FEED: each pipeline run appends its observe()
  *     accounting (e.g. [[graft.operators.CorpusPipeline]]'s kept/dropped
  *     counters, [[StatusLog]]'s run outcomes) as (run_id, metric, value)
  *     rows in parquet — the queryable store any dashboard tool scrapes;
  *  2. a generated DASHBOARD DESCRIPTOR: a deterministic Grafana-style
  *     JSON document with one stat panel per metric, pointed at the feed —
  *     the "provisioning" artifact, generated from the same metric list
  *     the pipeline emits so panels can't drift from the code.
  *
  * Determinism contract: callers supply run_id (no wall clock enters the
  * artifact), and the descriptor is a pure function of (title, metrics).
  */
object MetricsExport {

  /** Append one run's metrics to the feed (parquet, append mode — each
    * run is one small file set; compaction is the reader's concern, like
    * any metrics store).
    */
  def appendRun(spark: SparkSession, dir: String, runId: String,
                metrics: Map[String, Long]): Unit = {
    import spark.implicits._
    metrics.toSeq.sortBy(_._1).toDF("metric", "value")
      .select(lit(runId).as("run_id"), col("metric"), col("value"))
      .repartition(1)
      .write.mode("append").parquet(dir)
  }

  /** The feed, one row per (run_id, metric). */
  def feed(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(dir)

  /** Latest value per metric across runs, ordered — the "current state"
    * panel query (run_id is the caller's ordering key, e.g. a zero-padded
    * sequence or ISO timestamp string).
    */
  def latest(spark: SparkSession, dir: String): DataFrame =
    feed(spark, dir)
      .groupBy("metric")
      .agg(expr("max_by(value, run_id)").as("value"))
      .orderBy("metric")

  /** Deterministic Grafana-style dashboard JSON: one stat panel per
    * metric, 4 panels per row. Pure function of its inputs — byte-stable
    * across runs, so provisioning diffs are real changes.
    */
  def dashboardJson(title: String, metrics: Seq[String]): String = {
    def esc(s: String): String = s.flatMap {
      case '"'           => "\\\""
      case '\\'          => "\\\\"
      case c if c < ' '  => f"\\u${c.toInt}%04x"
      case c             => c.toString
    }
    val panels = metrics.zipWithIndex.map { case (m, i) =>
      val x = (i % 4) * 6
      val y = (i / 4) * 8
      s"""{"id":${i + 1},"type":"stat","title":"${esc(m)}",
         |"gridPos":{"h":8,"w":6,"x":$x,"y":$y},
         |"targets":[{"refId":"A","metric":"${esc(m)}"}]}""".stripMargin
        .replace("\n", "")
    }
    s"""{"title":"${esc(title)}","schemaVersion":39,"panels":[${panels.mkString(",")}]}"""
  }

  /** Write the descriptor next to the feed (the provisioning artifact). */
  def writeDashboard(path: String, title: String,
                     metrics: Seq[String]): Unit = {
    val p = java.nio.file.Paths.get(path)
    if (p.getParent != null) java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.write(p,
      dashboardJson(title, metrics).getBytes("UTF-8"))
  }
}
