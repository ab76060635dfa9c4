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

  /** All generation numbers; `completeOnly` keeps the ones whose Spark
    * `_SUCCESS` marker exists — a crash mid-write leaves a torn directory
    * without the marker, and readers/rotators must skip it.
    */
  private def generations(dir: String, completeOnly: Boolean = false): Seq[Long] = {
    val p = Paths.get(dir)
    if (!Files.isDirectory(p)) Seq.empty
    else {
      val stream = Files.list(p)
      try stream.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith(GenPrefix))
        .map(_.stripPrefix(GenPrefix).toLong)
        .filter(g => !completeOnly ||
          Files.exists(Paths.get(s"$dir/$GenPrefix$g/_SUCCESS")))
        .toSeq.sorted
      finally stream.close()
    }
  }

  /** The current log contents (empty frame with the right schema when no
    * complete log generation exists), newest first. Torn generations from
    * a crashed writer are ignored.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    generations(dir, completeOnly = true).lastOption match {
      case Some(g) => spark.read.schema(schema).parquet(s"$dir/$GenPrefix$g")
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  /** Append `entries` (ts, level, message) and rotate to the newest
    * `retain` rows. Tie-break (level, message) keeps rotation deterministic
    * for equal timestamps (§7.3).
    *
    * Single-writer contract (like the reference's one bootstrap script
    * appending to one log): concurrent appenders would race on the next
    * generation number. Readers are always safe — they only ever see
    * `_SUCCESS`-complete generations.
    */
  def append(spark: SparkSession, dir: String, entries: DataFrame,
             retain: Int = 50): Unit = {
    val next = read(spark, dir)
      .unionByName(entries.select(col("ts").cast(TimestampType),
        col("level").cast(StringType), col("message").cast(StringType)))
      .orderBy(col("ts").desc, col("level"), col("message"))
      .limit(retain)
    // a torn generation from a crashed writer may hold the highest number;
    // overwrite-mode makes retrying over it safe
    val newGen = generations(dir).lastOption.getOrElse(0L) + 1
    // bounded output (≤ retain rows): one file per generation
    next.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/$GenPrefix$newGen")
    // prune AFTER the new generation is durable (incl. any older torn dirs)
    generations(dir).filter(_ < newGen).foreach { g =>
      val genDir = Paths.get(s"$dir/$GenPrefix$g")
      val walk = Files.walk(genDir)
      try walk.iterator().asScala.toSeq.reverse.foreach(Files.deleteIfExists(_))
      finally walk.close()
    }
  }
}
