package graft.ingest

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable.ArrayBuffer
import Scraper._

class ScraperSpec extends AnyFunSuite {

  test("page-count banner parse strips comma grouping (scrape.py:57)") {
    assert(parseTopPage("junk Displaying page 1 of 1,234 junk").contains(1234))
    assert(parseTopPage("Displaying page 1 of 7").contains(7))
    assert(parseTopPage("no banner here").isEmpty)
  }

  test("backoff doubles on every failure class and caps at 600s — incl. HTTP status (pinned fix of scrape.py:40)") {
    val sleeps = ArrayBuffer[Double]()
    var calls = 0
    val cfg = Config(
      fetchSearch = () => Ok(""),
      fetchPage = _ => { calls += 1
        if (calls <= 3) HttpError(503)
        else if (calls <= 5) ConnError("timeout")
        else Ok("body") },
      writePage = (_, _) => (),
      sleep = sleeps += _)
    assert(fetchWithRetry(cfg, () => cfg.fetchPage(1)).contains("body"))
    assert(sleeps.toSeq == Seq(1.0, 2.0, 4.0, 8.0, 16.0))
    // cap: a long failure streak never exceeds 600s
    val capSleeps = ArrayBuffer[Double]()
    val failCfg = cfg.copy(fetchPage = _ => ConnError("down"),
      sleep = capSleeps += _, maxAttemptsPerPage = 15)
    assert(fetchWithRetry(failCfg, () => failCfg.fetchPage(1)).isEmpty)
    assert(capSleeps.max == 600.0)
  }

  test("crawl writes pages 1..top-1 behind PAGE delimiters (scrape.py:63-67)") {
    val pages = ArrayBuffer[(Int, String)]()
    val cfg = Config(
      fetchSearch = () => Ok("Displaying page 1 of 4"),
      fetchPage = n => Ok(s"content$n"),
      writePage = (n, s) => pages += (n -> s),
      sleep = _ => ())
    assert(crawl(cfg) == 3)
    assert(pages.map(_._1).toSeq == Seq(1, 2, 3))
    assert(pages.head._2 == "### PAGE 1 ####\ncontent1")
  }

  test("by-EudraCT summary mode: one retried fetch, page-1 framing (magicString.txt:6, S3 eudracts=)") {
    assert(summaryUrl(Seq("2012-004988-42", "2010-000011-11")) ==
      "https://www.clinicaltrialsregister.eu/ctr-search/rest/download/summary" +
        "?mode=selected&eudracts=2012-004988-42,2010-000011-11")
    val pages = ArrayBuffer[(Int, String)]()
    val sleeps = ArrayBuffer[Double]()
    var calls = 0
    val cfg = Config(
      fetchSearch = () => { calls += 1
        if (calls <= 2) HttpError(503) else Ok("summary body") },
      fetchPage = _ => fail("summary mode must never paginate"),
      writePage = (n, s) => pages += (n -> s),
      sleep = sleeps += _)
    assert(downloadSummary(cfg) == 1)
    assert(pages.toSeq == Seq(1 -> "### PAGE 1 ####\nsummary body"))
    assert(sleeps.toSeq == Seq(1.0, 2.0), "summary fetch must share the backoff policy")
    // exhaustion reports zero pages, never throws (no banner to parse)
    val dead = cfg.copy(fetchSearch = () => ConnError("down"),
      sleep = _ => (), maxAttemptsPerPage = 3)
    assert(downloadSummary(dead) == 0)
  }

  test("parameterized page url encodes the search query (magicString.txt:3, S3 query=)") {
    assert(pageUrl(2, "folfirinox").contains("query=folfirinox&page=2"))
    assert(pageUrl(1, "a b+c").contains("query=a+b%2Bc&page=1"))
    assert(pageUrl(3) == pageUrl(3, ""), "blank-query instance unchanged")
  }

  test("undeterminable page count aborts (scrape.py:60-61)") {
    val cfg = Config(() => Ok("no banner"), _ => Ok(""), (_, _) => (), _ => ())
    assertThrows[RuntimeException](crawl(cfg))
  }
}
