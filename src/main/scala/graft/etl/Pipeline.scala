package graft.etl

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables

/** The reference's batch ingestion pipeline (E1/E2, SURVEY §3) re-expressed
  * as composable DataFrame stages. Shape at scale: the per-document section
  * (S9–S15) is one narrow projection chain — a single whole-stage-codegen
  * span over however many executors hold the binary partitions; the only
  * wide operations are the S5 incremental anti-join (shuffle on base_name)
  * and any file-per-doc sink repartition.
  *
  * Error containment (S16, fetch_legal_docs.py:93-96): extraction failures
  * become quarantine rows, never task failures — `process` returns both
  * channels and the caller picks sinks for each.
  */
object Pipeline {

  /** S1–S3: hrefs scraped from a listing page → absolute PDF URLs.
    * (The HTTP fetch itself is driver-side / pre-staged — SURVEY §2.1 S1.)
    */
  def linksFromHrefs(hrefs: DataFrame, base: String = DocOps.DefaultBase): DataFrame =
    hrefs
      .filter(DocOps.isPdfLink(col("href")))
      .select(DocOps.absolutize(col("href"), base).as("url"))

  /** S1 parse + S2/S3, fully distributed: staged listing PAGES (any frame
    * with an HTML string column — e.g. `spark.read.text`/`binaryFile` over
    * fetched listings) → absolute PDF URLs. Only the network GET remains
    * driver-side (zero-egress); the HTML→href tokenization runs inside the
    * scan via the one-pass hrefs kernel, so a million listing pages parse
    * with executor parallelism (reference: scrape_pdf_links.py:12-14 does
    * this single-threaded per page).
    */
  def linksFromListingHtml(pages: DataFrame, htmlCol: String = "html",
                           base: String = DocOps.DefaultBase): DataFrame =
    linksFromHrefs(
      pages.select(explode(graft.functions.expressions.NativeExprs
        .hrefs(col(htmlCol))).as("href")),
      base)

  /** S5 — incremental anti-join: keep only URLs whose base_name has no
    * already-processed output (reference: fetch_legal_docs.py:41-43, the
    * file-exists check — generalized to a distributed anti-join so the
    * "processed set" can be 10^10 rows without a driver-side lookup).
    */
  def incremental(links: DataFrame, processedBaseNames: DataFrame): DataFrame = {
    val withBase = links.withColumn("base_name", DocOps.baseNameOf(col("url")))
    withBase.join(processedBaseNames.select(col("base_name")),
                  Seq("base_name"), "left_anti")
  }

  /** Result channels of the per-document stage (S16 quarantine pattern). */
  final case class Processed(docs: DataFrame, quarantine: DataFrame)

  /** Raster-loss visibility (VERDICT r13 item 4): per-(url, filter)
    * counts of stream objects the codec skipped for unsupported filters
    * — the text a no-OCR corpus silently loses to scanned pages. Runs on
    * ALL binaries (good-channel documents included: a half-scanned
    * volume extracts its text pages and never reaches quarantine, which
    * is exactly why the loss needs its own channel). Lazy frame, same
    * narrow-scan shape as the S9 projection — callers aggregate it into
    * the metrics feed ([[MetricsExport]]) / hub status; at 100 TB only
    * (url, filter, count) rows ever leave the scan.
    */
  def rasterLoss(binaries: DataFrame, extractor: PageExtractor): DataFrame = {
    val skipUdf = udf((bytes: Array[Byte]) =>
      if (bytes == null) Map.empty[String, Int]
      else try extractor.skippedStreams(bytes)
      catch { case _: Exception => Map.empty[String, Int] })
    binaries.select(col("url"),
      explode(skipUdf(col("content"))).as(Seq("filter", "n_streams")))
  }

  /** S9–S14 over staged binaries: (url, content: BINARY) → document records
    * + quarantine channel. `extractor` runs inside a deserializing map — the
    * page *dataflow* (explode → order-preserving reassembly) is plain Spark.
    *
    * @param keepEmptyPages mcp_server.py:27-28 keeps empty pages as "";
    *                       the CLI pipeline drops them (fetch_legal_docs.py:63).
    * @param ingestDate     injected run date (reference uses today();
    *                       injection keeps runs reproducible).
    * @param broadcastQuarantine SCALE LEVER (the coShingledPairs
    *                       broadcastCounts pattern): the quarantine
    *                       diagnosis broadcasts the quarantined-url set
    *                       by default — optimal while failures are the
    *                       exception. Under SYSTEMIC failure (wrong
    *                       codec wired, upstream format change: the
    *                       quarantine set ≈ the whole corpus) the
    *                       broadcast build would collect corpus-many
    *                       urls to the driver and abort on the
    *                       broadcast budget — pass `false` there to
    *                       fall back to a shuffled join that degrades
    *                       slowly instead (r12 review).
    */
  def process(binaries: DataFrame, extractor: PageExtractor,
              ingestDate: String, keepEmptyPages: Boolean = false,
              category: Column = lit("CassationDecision"),
              broadcastQuarantine: Boolean = true): Processed = {
    val spark = binaries.sparkSession
    val extractUdf = udf((bytes: Array[Byte]) =>
      if (bytes == null) Seq.empty[String]
      else try extractor.extractPages(bytes)
      catch { case _: Exception => Seq.empty[String] })

    // S9: binary → pages with position (posexplode keeps page order explicit)
    val pages = binaries
      .select(col("url"), posexplode_outer(extractUdf(col("content")))
        .as(Seq("pos", "page")))
    val kept = if (keepEmptyPages) pages
               else pages.filter(col("page").isNull || DocOps.nonEmptyPage(col("page")))

    // S10: ordered reassembly — sort_array(collect_list(struct)) per §7.3.
    // Left-join back to the URL set: a doc whose pages were ALL dropped
    // (or whose extraction failed) must surface in quarantine, not vanish.
    val reassembled = binaries.select("url").distinct()
      .join(
        kept.filter(col("page").isNotNull)
          .groupBy("url")
          .agg(DocOps.joinPages(
            collect_list(struct(col("pos"), col("page").as("txt"))))
            .as("content")),
        Seq("url"), "left")
      .withColumn("content", coalesce(col("content"), lit("")))

    // S11 gate splits good docs from quarantine (S16): whitespace-only text
    // means a failed/garbage parse — the reference logs and skips
    // (fetch_legal_docs.py:66-68) and the consolidated variant deletes the
    // bad PDF (import requests.py:84); here the row lands in `quarantine`
    // for the caller's compensating action.
    val good = reassembled
      .filter(DocOps.nonEmptyDoc(col("content")))
      .select(DocOps.docRecord(col("url"), col("content"), lit(ingestDate),
          category)
        .as("doc"))
      .select("doc.*")
    // Reason-coded quarantine (VERDICT r11 item 3): BROADCAST the
    // (small by construction — it's the failure channel) quarantined-url
    // set against the binaries as a semi-join, so the corpus-sized
    // binary column is streamed map-side and never shuffled (r12 review:
    // the previous urls-left join planned a sort-merge that exchanged
    // every document's raw bytes on every consuming action, including
    // each streaming micro-batch), and run the codec's structural
    // diagnosis on just the surviving rows — the happy path pays
    // nothing, and the diagnosis re-parses structure without re-decoding
    // streams. Every quarantined url exists in `binaries` (the
    // quarantine set derives from binaries' own url set), so the
    // semi-join loses nothing vs the old left join. groupBy(min) keeps
    // the one-row-per-url contract even if the same url was staged
    // twice; only (url, reason) strings reach that exchange.
    val diagnoseUdf = udf((bytes: Array[Byte]) =>
      if (bytes == null) "no-content"
      else try extractor.diagnose(bytes)
      catch { case _: Exception => "empty-text" })
    // the semi-join key is NULL-NORMALIZED on both sides (r12 review: a
    // plain equi semi-join drops null-url rows — null never equals null
    // — and a document would vanish from BOTH channels, violating the
    // must-surface-in-quarantine invariant above). The key is a
    // (isNull, value) STRUCT, not a string sentinel: no string can
    // collide with the null encoding (review round 3 -- a sentinel url
    // would semi-join-match a real document into the wrong channel),
    // and the usingColumns join keeps Spark's ambiguous-self-join check
    // happy where an explicit null-safe-equality condition over two
    // lineage-shared frames would not.
    val nullKey = (c: Column) =>
      struct(c.isNull.as("n"), coalesce(c, lit("")).as("u"))
    val quarantinedUrls = reassembled
      .filter(!DocOps.nonEmptyDoc(col("content")))
      .select(nullKey(col("url")).as("_k"))
    val urlSide =
      if (broadcastQuarantine) broadcast(quarantinedUrls)
      else quarantinedUrls.hint("shuffle_hash")
    val quarantine = binaries
      .select(nullKey(col("url")).as("_k"), col("url"), col("content"))
      .join(urlSide, Seq("_k"), "left_semi")
      .select(col("url"), diagnoseUdf(col("content")).as("reason"))
      .groupBy("url").agg(min(col("reason")).as("reason"))
    Processed(good, quarantine)
  }

  /** S15 — document sink: UTF-8 JSON, non-ASCII preserved (Spark writes
    * unescaped UTF-8 by default, matching ensure_ascii=False at
    * fetch_legal_docs.py:89). `filePerDoc` repartitions by title so each
    * document lands in its own file, preserving the reference's
    * one-file-per-doc contract when required; the analytic default is plain
    * part-files (no extra shuffle).
    */
  def writeDocs(docs: DataFrame, path: String, filePerDoc: Boolean = false): Unit =
    if (filePerDoc) {
      // maxRecordsPerFile=1 is what actually guarantees one document per
      // file — repartition(col) alone hash-collides titles into shared
      // part-files once docs outnumber shuffle partitions
      docs.repartition(col("title"))
        .write.mode("overwrite").option("maxRecordsPerFile", "1").json(path)
    } else docs.write.mode("overwrite").json(path)

  /** Read back reference-shaped documents with the fixed contract schema —
    * explicit, never inferred (SURVEY §1.2).
    */
  def readDocs(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Tables.legalDocSchema).json(path)

  /** S16 compensating action (reference: import requests.py:84 — the
    * consolidated pipeline DELETES the PDF it could not extract). Takes the
    * quarantine channel with a `pathCol` column naming each staged binary
    * and removes those files, executor-side, partition-parallel.
    *
    * foreachBatch-shaped via [[compensatingDeleteBatch]] and IDEMPOTENT:
    * `deleteIfExists` is a no-op on absent files, so when streaming
    * recovery replays a micro-batch the second pass converges to the same
    * state instead of failing — the property PipelineSpec pins. (Local/NFS
    * staging; an object-store staging area would swap its client in here.)
    */
  def compensatingDelete(quarantine: DataFrame, pathCol: String = "path"): Unit =
    quarantine.select(pathCol).distinct()
      .foreachPartition { rows: java.util.Iterator[org.apache.spark.sql.Row] =>
        while (rows.hasNext) {
          val p = rows.next().getString(0)
          // per-record containment (S16): a malformed path must not fail
          // the task — binaryFile paths like 'file:/x/Vol 01.pdf' (spaces,
          // the reference's natural naming) are not valid URIs, so URI
          // parsing is best-effort with the raw string as fallback
          if (p != null) try {
            val fsPath =
              try Option(new java.net.URI(p).getPath).getOrElse(p)
              catch { case _: java.net.URISyntaxException =>
                if (p.startsWith("file:")) p.stripPrefix("file:") else p }
            java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(fsPath))
          } catch { case _: Exception => () }
        }
      }

  /** [[compensatingDelete]] curried for `writeStream.foreachBatch`. */
  def compensatingDeleteBatch(pathCol: String = "path")(
      quarantine: DataFrame, batchId: Long): Unit =
    compensatingDelete(quarantine, pathCol)
}
