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

  test("undeterminable page count aborts (scrape.py:60-61)") {
    val cfg = Config(() => Ok("no banner"), _ => Ok(""), (_, _) => (), _ => ())
    assertThrows[RuntimeException](crawl(cfg))
  }
}
