package graft.etl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Column-level implementations of the reference's per-record ETL operators
  * (SURVEY §2.1). Pure `Column` functions — they compose into one narrow,
  * whole-stage-codegen'd projection chain, so the per-document section of the
  * pipeline runs as a single pipelined stage at any scale.
  *
  * Reference semantics cited per function (file:line in /root/reference).
  */
object DocOps {

  /** Base URL of the reference's source site (scrape_pdf_links.py:5). */
  val DefaultBase = "https://www.fsc.gov.et"

  // ------------------------------------------------------------------ S2/S3
  /** S2 — link filter: keep hrefs ending in ".pdf"
    * (reference: scrape_pdf_links.py:12-13, CSS `a[href$='.pdf']`).
    */
  def isPdfLink(href: Column): Column = href.endsWith(".pdf")

  /** S3 — URL absolutization: prefix the site base unless already absolute
    * (reference: scrape_pdf_links.py:14 — checks startswith('http')).
    */
  def absolutize(href: Column, base: String = DefaultBase): Column =
    when(href.startsWith("http"), href).otherwise(concat(lit(base), href))

  // ------------------------------------------------------------------- S13
  /** S13 — filename from URL: basename, strip ".pdf", "%20" → "_"
    * (reference: fetch_legal_docs.py:35-36 — split('/')[-1],
    * replace('.pdf',''), replace('%20','_')).
    */
  def baseNameOf(url: Column): Column =
    regexp_replace(
      regexp_replace(regexp_extract(url, "[^/]+$", 0),
        // .docx joins .pdf for the statute path; .doc (r17, ordered
        // after docx so the alternation strips the longer suffix whole)
        // for the legacy Word-97–2003 population
        "\\.(pdf|docx|doc)$", ""),
      "%20", "_")

  /** S13 — display title: base name with "_" → " "
    * (reference: fetch_legal_docs.py:75 — base_name.replace('_',' ')).
    */
  def titleOf(baseName: Column): Column = regexp_replace(baseName, "_", " ")

  /** The reference's per-file resource routing, by evident INTENT
    * (auto_ingest.yml:27-29: `[[ $file == vol* ]] && echo
    * cassation_decision || echo statute`): a BASENAME starting with
    * `vol` is a cassation decision, EVERYTHING else — statutes-tree PDFs
    * and `*.docx` alike — is a statute. Deliberate deviation from the
    * reference's literal behavior (review finding, r12): its `$file`
    * comes from `find .`, so every path starts with `./` and the `vol*`
    * glob never matches — run literally, everything posts as statute.
    * The basename semantics match the workflow's evident intent and the
    * per-file `vol*.pdf` trigger. Case-sensitive glob parity preserved;
    * pair with `docRecord(category = ...)` for per-row categorization of
    * mixed corpora.
    */
  def autoCategory(url: Column): Column =
    when(regexp_extract(url, "[^/]+$", 0).startsWith("vol"),
      lit("CassationDecision")).otherwise(lit("Statute"))

  // ------------------------------------------------------------------- S12
  /** S12 — year extraction: first `\b(19[5-9]\d|20\d{2})\b` match within the
    * first 1000 chars, else the reference's "" sentinel
    * (reference: fetch_legal_docs.py:21-30; the 1000-char window is the
    * reference's own efficiency trick, constant-folded here).
    * regexp_extract returns "" on no-match — exactly the sentinel.
    */
  def yearOf(content: Column): Column =
    regexp_extract(substring(content, 1, 1000), "\\b(19[5-9]\\d|20\\d{2})\\b", 1)

  // --------------------------------------------------------------- S9 / S10
  /** S9 — empty-page predicate. The two reference variants disagree:
    * the CLI pipeline drops whitespace-only pages (fetch_legal_docs.py:63,
    * `if page.extract_text()`), the API keeps them as "" (mcp_server.py:27-28).
    * `keepEmptyPages = false` is the default (consolidated-pipeline
    * semantics, SURVEY §7.4).
    */
  def nonEmptyPage(page: Column): Column = page.rlike("\\S")

  /** S10 — ordered page reassembly: pages (pos, txt) → "\n".join in page
    * order (reference: fetch_legal_docs.py:64). Input is an
    * ARRAY<STRUCT<pos INT, txt STRING>> aggregated per document;
    * array_sort on the struct sorts by pos first, making the order explicit
    * regardless of partition layout (SURVEY §7.3 — bare collect_list order
    * is nondeterministic).
    */
  def joinPages(pagesStructs: Column): Column =
    array_join(transform(array_sort(pagesStructs), p => p.getField("txt")), "\n")

  // ------------------------------------------------------------------- S11
  /** S11 — empty-document predicate: drop docs whose full text is
    * whitespace-only (reference: fetch_legal_docs.py:66-68, Python
    * `text.strip()` — strips ALL whitespace, so the Spark equivalent is
    * "contains a non-whitespace char", not `trim` which only strips spaces).
    */
  def nonEmptyDoc(content: Column): Column = content.rlike("\\S")

  // -------------------------------------------------------------------- S7
  /** S7 — Content-Type gate (reference: fetch_legal_docs.py:52-54). */
  def isPdfContentType(contentType: Column): Column =
    contentType.contains("application/pdf")

  // ------------------------------------------------------------------- S14
  /** S14 — full document record from (url, content) with the reference's
    * constant defaults (reference: fetch_legal_docs.py:74-85; empty-string /
    * empty-array sentinels from schema.json, never null).
    * `ingestDate` is injected (not current_date()) so runs are reproducible;
    * callers pass the run date.
    * `category` parameterizes the record for the statute path (the
    * reference ingests the statutes tree and `*.docx` with
    * `resource_type=statute`, auto_ingest.yml:27-29); the default is the
    * reference's own constant (mcp_server.py:35). It is a COLUMN so mixed
    * corpora can categorize per row (pair with [[autoCategory]] and the
    * sniffing extractor — review finding, r11). Tags mirror the
    * category, matching the reference's tags=[category] shape
    * (fetch_legal_docs.py:80).
    */
  def docRecord(url: Column, content: Column, ingestDate: Column,
                category: Column = lit("CassationDecision")): Column = {
    val base = baseNameOf(url)
    val emptyArr = array().cast(ArrayType(StringType))
    struct(
      titleOf(base).as("title"),
      yearOf(content).as("year"),
      url.as("sourceURL"),
      ingestDate.as("dateIngested"),
      category.as("category"),
      array(category).as("tags"),
      content.as("content"),
      struct(lit("").as("issue"), lit("").as("holding"), lit("").as("ratio"))
        .as("caseFields"),
      struct(lit("").as("scope"), emptyArr.as("keyArticles"),
             lit("").as("effectiveDate")).as("legisFields"),
      struct(emptyArr.as("placeholders")).as("templateFields"))
  }
}
