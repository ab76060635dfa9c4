package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicInteger

object FetchSpec {
  // client-open counter: local-mode executors share this JVM, so the spec
  // can assert one client per PARTITION, not per URL (the Session-reuse
  // property the reference gets from requests.Session)
  val opens = new AtomicInteger(0)

  final class FakeFetcher extends Fetch.UrlFetcher {
    def fetch(url: String): Either[String, (String, Array[Byte])] =
      if (url.contains("boom")) Left("ConnectException: refused")
      else if (url.contains("html")) Right(("text/html", "<html/>".getBytes))
      else Right(("application/pdf", s"Decided 1998 pdf-of $url".getBytes))
  }
  object FakeFactory extends Fetch.FetcherFactory {
    def open(): Fetch.UrlFetcher = { opens.incrementAndGet(); new FakeFetcher }
  }
}

/** S6 partition-parallel fetch: one client per partition, error containment
  * to rows (S16), content-type gate feeding the pipeline (S7).
  */
class FetchSpec extends SparkSpec {
  import spark.implicits._

  test("fetchAll — per-partition client, error rows, S7 gate channels") {
    FetchSpec.opens.set(0)
    val links = Seq(
      "https://x/Vol%2001.pdf", "https://x/Vol%2002.pdf",
      "https://x/boom.pdf", "https://x/page.html").toDF("url")
    val fetched = Fetch.fetchAll(links, FetchSpec.FakeFactory, parallelism = 2)
    val rows = fetched.collect()
    assert(rows.length === 4) // exactly one output row per URL
    assert(FetchSpec.opens.get() === 2) // ONE client per partition, not per URL

    val out = Fetch.partition(fetched)
    val ok = out.docs.as[(String, Array[Byte])].collect().toMap
    assert(ok.keySet === Set("https://x/Vol%2001.pdf", "https://x/Vol%2002.pdf"))
    assert(new String(ok("https://x/Vol%2001.pdf"))
      === "Decided 1998 pdf-of https://x/Vol%2001.pdf")
    val q = out.quarantine.as[(String, String)].collect().toMap
    assert(q("https://x/boom.pdf").startsWith("ConnectException"))
    assert(q("https://x/page.html") === "not_pdf:text/html")
  }

  test("fetchAll feeds the full E1 chain: links → fetch → gate → documents") {
    val links = Seq("https://x/Decided%201998.pdf", "https://x/boom.pdf").toDF("url")
    val out = Fetch.partition(Fetch.fetchAll(links, FetchSpec.FakeFactory))
    // FakeFetcher bodies are plain text; FormFeedExtractor treats them as
    // one page — the real S9 PDF codec is PageExtractor's concern
    val processed = Pipeline.process(out.docs, FormFeedExtractor, "2026-08-12")
    val docs = processed.docs.collect()
    assert(docs.length === 1)
    assert(docs.head.getAs[String]("title") === "Decided 1998")
    assert(docs.head.getAs[String]("year") === "1998")
    assert(out.quarantine.count() === 1)
  }

  test("readBounded caps a network body at the ceiling, exact-size bodies pass (r12 hardening)") {
    def in(n: Int) = new java.io.ByteArrayInputStream(Array.fill[Byte](n)(7))
    assert(Fetch.readBounded(in(1000), max = 1000).map(_.length) === Right(1000))
    assert(Fetch.readBounded(in(0), max = 10).map(_.length) === Right(0))
    val over = Fetch.readBounded(in(1001), max = 1000)
    assert(over.isLeft && over.swap.toOption.get.contains("exceeds"), over)
    // the shipped ceiling is generous vs the corpus (reference volumes
    // are tens of MB) — pin it so a refactor can't silently shrink it
    assert(Fetch.MaxBodyBytes === (256 << 20))
  }
}
