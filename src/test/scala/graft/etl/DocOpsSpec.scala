package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit tests for the reference's per-record operators (SURVEY §2.1),
  * including the edge cases the reference encodes: no-year docs, %20 names,
  * non-ASCII content, empty pages.
  */
class DocOpsSpec extends SparkSpec {
  import spark.implicits._

  test("S2/S3 — pdf link filter + absolutization") {
    val hrefs = Seq("/files/vol01.pdf", "https://x.org/v.pdf", "/about.html",
                    "/files/Vol%2026.pdf").toDF("href")
    val out = Pipeline.linksFromHrefs(hrefs).as[String].collect().sorted
    assert(out === Array(
      "https://www.fsc.gov.et/files/Vol%2026.pdf",
      "https://www.fsc.gov.et/files/vol01.pdf",
      "https://x.org/v.pdf"))
  }

  test("S1 parse + S2/S3 — staged listing HTML → absolute PDF URLs (distributed)") {
    // the reference's scrape_pdf_links.py flow with the GET pre-staged:
    // a[href$='.pdf'] out of raw listing HTML, then absolutize
    val page =
      """<html><body>
        |<a href="/files/vol01.pdf">Vol 1</a>
        |<a href='https://x.org/v.pdf'>ext</a>
        |<a href="/about.html">about</a>
        |<!-- <a href="/commented-out.pdf"> -->
        |<a href="/files/Vol%2026.pdf">Vol 26</a>
        |</body></html>""".stripMargin
    val out = Pipeline.linksFromListingHtml(Seq(page).toDF("html"))
      .as[String].collect().sorted
    assert(out === Array(
      "https://www.fsc.gov.et/files/Vol%2026.pdf",
      "https://www.fsc.gov.et/files/vol01.pdf",
      "https://x.org/v.pdf"))
  }

  test("S13 — base name and title derivation (%20 → _ → space)") {
    val df = Seq("https://ex.org/a/Cassation%20Vol%2026.pdf").toDF("url")
      .select(DocOps.baseNameOf($"url").as("base"))
      .withColumn("title", DocOps.titleOf($"base"))
    val r = df.as[(String, String)].head()
    assert(r === ("Cassation_Vol_26", "Cassation Vol 26"))
    // r11: .docx strips like .pdf; other extensions pass through
    val exts = Seq("https://x/Proc%201.docx", "https://x/vol02.pdf",
      "https://x/notes.txt").toDF("url")
      .select(DocOps.baseNameOf($"url").as("base")).as[String].collect()
    assert(exts.toSeq === Seq("Proc_1", "vol02", "notes.txt"))
  }

  test("autoCategory — the auto_ingest vol*-vs-statute rule, verbatim (r11)") {
    // auto_ingest.yml:27-29: [[ $file == vol* ]] → cassation_decision,
    // EVERYTHING else (statutes-tree PDFs, *.docx, and names merely
    // CONTAINING vol) → statute; case-sensitive glob parity
    val got = Seq(
      "https://x/vol01.pdf", "https://x/volume%20two.pdf",
      "https://x/Vol%2001.pdf", // capital V: the glob does NOT match
      "https://x/statutes/family_code.pdf", "https://x/Proc%201.docx",
      "https://x/evolution.pdf") // contains vol, does not START with it
      .toDF("url")
      .select(DocOps.autoCategory($"url")).as[String].collect()
    assert(got.toSeq === Seq("CassationDecision", "CassationDecision",
      "Statute", "Statute", "Statute", "Statute"))
  }

  test("S12 — year regex: first match in first 1000 chars, \"\" sentinel") {
    val rows = Seq(
      ("decided in 1998 and appealed 2001", "1998"),
      ("no year here", ""),               // sentinel, not null
      ("year 1942 is below the range", ""), // 19[5-9]\d only
      ("x" * 1000 + " 1999", ""),         // outside the 1000-char window
      ("x" * 990 + " 1999", "1999"))      // inside the window
    val df = rows.toDF("content", "expected")
      .withColumn("got", DocOps.yearOf($"content"))
    assert(df.filter($"got" =!= $"expected").count() === 0)
    // sentinel is empty string, never null (schema.json contract)
    assert(df.filter($"got".isNull).count() === 0)
  }

  test("S14 — record construction: constants, sentinels, nested structs") {
    val doc = Seq(("https://ex.org/Vol%2001.pdf", "Decided 1998\nbody"))
      .toDF("url", "content")
      .select(DocOps.docRecord($"url", $"content", lit("2026-08-12")).as("doc"))
      .select("doc.*")
    val r = doc.head()
    assert(r.getAs[String]("title") === "Vol 01")
    assert(r.getAs[String]("year") === "1998")
    assert(r.getAs[String]("category") === "CassationDecision")
    assert(r.getAs[Seq[String]]("tags") === Seq("CassationDecision"))
    assert(r.getAs[org.apache.spark.sql.Row]("caseFields").getAs[String]("issue") === "")
    assert(r.getAs[org.apache.spark.sql.Row]("legisFields")
      .getAs[Seq[String]]("keyArticles") === Seq.empty)
    // literal-built records carry non-nullable fields; the contract schema
    // declares everything nullable (JSON) — compare modulo nullability
    import org.apache.spark.sql.types._
    def norm(dt: DataType): DataType = dt match {
      case s: StructType => StructType(s.fields.map(f =>
        StructField(f.name, norm(f.dataType), nullable = true)))
      case a: ArrayType => ArrayType(norm(a.elementType), containsNull = true)
      case other => other
    }
    assert(norm(doc.schema) === norm(graft.Tables.legalDocSchema))
  }

  test("S10 — ordered reassembly is partition-order independent") {
    // shuffled input partitions must still join pages in pos order
    val pages = Seq((2, "gamma"), (0, "alpha"), (1, "beta"))
      .toDF("pos", "txt").repartition(3)
    val joined = pages
      .groupBy(lit(1).as("k"))
      .agg(DocOps.joinPages(collect_list(struct($"pos", $"txt"))).as("content"))
      .select("content").as[String].head()
    assert(joined === "alpha\nbeta\ngamma")
  }

  test("S7/S9/S11 — predicates") {
    import org.apache.spark.sql.Row
    val df = Seq("application/pdf; charset=x", "text/html").toDF("ct")
    assert(df.filter(DocOps.isPdfContentType($"ct")).count() === 1)
    val pages = Seq("  ", "text", "\t\n").toDF("p")
    assert(pages.filter(DocOps.nonEmptyPage($"p")).count() === 1)
  }
}
