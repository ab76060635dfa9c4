package graft.etl

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S6 — partition-parallel URL fetch (reference: fetch_legal_docs.py:49-50,
  * one sequential GET per URL; `import requests.py:118` reuses one Session
  * for the whole loop). The engine shape: `mapPartitions` with ONE client
  * per partition — connection reuse like the reference's Session, but
  * partition-parallel across executors, and every outcome contained
  * per-record (S16): a failure becomes an error row, never a task failure.
  *
  * The HTTP client is pluggable ([[UrlFetcher]]) for the same reason the
  * PDF codec is ([[PageExtractor]]): this container is zero-egress, so
  * specs drive the full dataflow with a deterministic in-memory fetcher;
  * [[HttpUrlFetcher]] is the real-world default (JDK HttpURLConnection —
  * no new dependencies).
  *
  * At 100 TB-scale ingest the URL list is repartitioned to the desired
  * fetch parallelism first; each partition holds its client for its whole
  * lifetime, and the output is immediately a binary-column DataFrame the
  * S7 gate and S9 pipeline consume.
  */
object Fetch {

  /** One fetch attempt: either (contentType, bytes) or a failure message. */
  trait UrlFetcher extends java.io.Closeable {
    def fetch(url: String): Either[String, (String, Array[Byte])]
    override def close(): Unit = ()
  }

  /** Response-body ceiling for network reads (r12 hardening, the codec
    * MaxDecodedStreamBytes companion): `readAllBytes()` on a socket let
    * ONE hostile/broken server — or one oversized upload on the ingest
    * shim — materialize unbounded bytes in executor/driver memory before
    * any codec ceiling could apply. The read timeout bounds TIME, not
    * size. Generous vs the corpus (reference volumes are tens of MB).
    */
  private[etl] val MaxBodyBytes: Int = 256 << 20

  /** Read at most `max` bytes; Left past the cap (the caller's error
    * channel carries it — an S16 error row on the fetch path, an error
    * JSON on the ingest shim).
    */
  private[etl] def readBounded(in: java.io.InputStream,
                               max: Int): Either[String, Array[Byte]] = {
    val out = new java.io.ByteArrayOutputStream(8192)
    val buf = new Array[Byte](8192)
    var n = in.read(buf)
    while (n >= 0) {
      out.write(buf, 0, n)
      if (out.size > max) return Left(s"body exceeds $max bytes")
      n = in.read(buf)
    }
    Right(out.toByteArray)
  }

  /** Factory shipped to executors — must be Serializable; the CLIENT it
    * creates need not be (it never leaves its partition).
    */
  trait FetcherFactory extends Serializable {
    def open(): UrlFetcher
  }

  /** Real-world default: JDK HttpURLConnection with the reference's
    * timeout discipline (fetch_legal_docs.py:49 → 30 s).
    */
  final class HttpUrlFetcher(timeoutMs: Int) extends UrlFetcher {
    def fetch(url: String): Either[String, (String, Array[Byte])] =
      try {
        val conn = new java.net.URI(url).toURL.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setConnectTimeout(timeoutMs)
        conn.setReadTimeout(timeoutMs)
        try {
          val code = conn.getResponseCode
          if (code >= 400) Left(s"HTTP $code")
          else {
            val ct = Option(conn.getContentType).getOrElse("")
            val in = conn.getInputStream
            try readBounded(in, MaxBodyBytes).map((ct, _)) finally in.close()
          }
        } finally conn.disconnect()
      } catch { case e: Exception => Left(s"${e.getClass.getSimpleName}: ${e.getMessage}") }
  }

  object HttpFactory extends FetcherFactory {
    def open(): UrlFetcher = new HttpUrlFetcher(30000)
  }

  val schema: StructType = StructType(Seq(
    StructField("url", StringType),
    StructField("contentType", StringType),
    StructField("content", BinaryType),
    StructField("error", StringType)))

  /** links(url) → (url, contentType, content, error): exactly one output
    * row per input URL; `error` null on success, `content` null on failure
    * — split downstream with [[partition]]. `parallelism` > 0 repartitions
    * the URL list first (the fetch is the bottleneck, not the shuffle).
    */
  def fetchAll(links: DataFrame, factory: FetcherFactory,
               parallelism: Int = 0): DataFrame = {
    val spark = links.sparkSession
    val in = if (parallelism > 0) links.repartition(parallelism) else links
    val enc = org.apache.spark.sql.Encoders.row(schema)
    in.select(col("url").cast(StringType)).mapPartitions { rows =>
      // ONE client per partition, iterator-to-iterator (no partition-wide
      // buffering). Closed by a task-completion listener, which fires on
      // EVERY exit path — full drain, downstream limit() that stops early,
      // or a task failure — so the client can never leak.
      val client = factory.open()
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit](_ => client.close()))
      rows.map { r =>
        val url = r.getString(0)
        client.fetch(url) match {
          case Right((ct, bytes)) => Row(url, ct, bytes, null)
          case Left(err)          => Row(url, null, null, err)
        }
      }
    }(enc)
  }

  /** Split fetch results into the S7-gated binary channel and the S16
    * quarantine channel (failures + non-PDF content types).
    */
  def partition(fetched: DataFrame): Pipeline.Processed = {
    // null-safe gate: a success row always has a contentType, but coalesce
    // keeps the two channels a PARTITION (no row can vanish from both)
    val isPdf = DocOps.isPdfContentType(coalesce(col("contentType"), lit("")))
    val ok = fetched.filter(col("error").isNull && isPdf)
      .select(col("url"), col("content"))
    val quarantine = fetched.filter(col("error").isNotNull || !isPdf)
      .select(col("url"),
        coalesce(col("error"),
          concat(lit("not_pdf:"), coalesce(col("contentType"), lit(""))))
          .as("reason"))
    Pipeline.Processed(ok, quarantine)
  }
}
