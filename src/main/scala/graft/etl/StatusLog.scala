package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** S17 — the reference's bounded status log: an append-only run log rotated
  * to its newest `retain` entries (one-strike-bootstrap.sh:26 and
  * deploy-gh-pages.yml:19-20 keep the last 50 lines). Engine shape:
  *
  *  - retention is the q21 top-k shape — `orderBy(...).limit(retain)` plans
  *    TakeOrderedAndProject, so rotation never globally sorts even if a
  *    caller appends a huge frame;
  *  - each rotation writes a NEW generation directory and prunes older
  *    generations only after the new one is fully written, so a concurrent
  *    reader always sees a complete log (write-new-then-prune, the same
  *    discipline as the streaming sinks' batchId-keyed overwrites);
  *  - the artifact itself is bounded (≤ retain rows) by definition, so the
  *    generation bookkeeping is driver-side filesystem listing — large-scale
  *    observability goes through observe()/listeners (CorpusPipeline), not
  *    this log.
  */
object StatusLog {

  val schema: StructType = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("level", StringType),
    StructField("message", StringType)))

  private val GenPrefix = "gen_"

  private def generations(dir: String): Seq[Long] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Seq.empty
    else Files.list(p).iterator().asScala
      .map(_.getFileName.toString)
      .filter(_.startsWith(GenPrefix))
      .map(_.stripPrefix(GenPrefix).toLong)
      .toSeq.sorted
  }

  /** The current log contents (empty frame with the right schema when no
    * log exists yet), newest first.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    generations(dir).lastOption match {
      case Some(g) => spark.read.schema(schema).parquet(s"$dir/$GenPrefix$g")
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  /** Append `entries` (ts, level, message) and rotate to the newest
    * `retain` rows. Tie-break (level, message) keeps rotation deterministic
    * for equal timestamps (§7.3).
    */
  def append(spark: SparkSession, dir: String, entries: DataFrame,
             retain: Int = 50): Unit = {
    val next = read(spark, dir)
      .unionByName(entries.select(col("ts").cast(TimestampType),
        col("level").cast(StringType), col("message").cast(StringType)))
      .orderBy(col("ts").desc, col("level"), col("message"))
      .limit(retain)
    val newGen = generations(dir).lastOption.getOrElse(0L) + 1
    // bounded output (≤ retain rows): one file per generation
    next.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/$GenPrefix$newGen")
    // prune AFTER the new generation is durable
    generations(dir).filter(_ < newGen).foreach { g =>
      val genDir = Paths.get(s"$dir/$GenPrefix$g")
      Files.walk(genDir).iterator().asScala.toSeq.reverse
        .foreach(Files.deleteIfExists(_))
    }
  }
}
