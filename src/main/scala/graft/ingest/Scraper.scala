package graft.ingest

/** Registry corpus ingester (reference scrape.py) — a driver-side I/O
  * utility, not cluster work (SURVEY §2.1 S1–S4): probe the page count
  * from the "Displaying page 1 of N" banner, then fetch pages 1..N-1
  * with exponential-backoff retry, writing each page behind a
  * `### PAGE {n} ####` delimiter (scrape.py:66) for [[graft.registry.Corpus]]
  * to re-split.
  *
  * I/O is injected (fetch/sink/sleep) so the policy is unit-testable
  * without a network. Pinned divergence (SURVEY §7.4.4b): the reference
  * DISCARDS the doubled backoff for HTTP-status errors (scrape.py:40 —
  * the return value of sleep_on_error is dropped), so its retry storm
  * never slows down on 5xx; the engine backs off on every error class.
  */
object Scraper {

  val InitialBackoffSec = 1.0
  val MaxBackoffSec = 600.0 // scrape.py:21-22

  sealed trait FetchResult
  final case class Ok(body: String) extends FetchResult
  final case class HttpError(status: Int) extends FetchResult
  final case class ConnError(msg: String) extends FetchResult

  final case class Config(
      fetchSearch: () => FetchResult,
      fetchPage: Int => FetchResult,
      writePage: (Int, String) => Unit,
      sleep: Double => Unit,
      maxAttemptsPerPage: Int = 100)

  private val countRe = """Displaying page 1 of ([0-9,]+)""".r.unanchored

  /** Comma-grouped count → int (reference scrape.py:57, F9). */
  def parseTopPage(body: String): Option[Int] = body match {
    case countRe(n) => Some(n.replace(",", "").toInt)
    case _          => None
  }

  /** Fetch with retry: backoff doubles on EVERY failure class, capped. */
  def fetchWithRetry(cfg: Config, fetch: () => FetchResult): Option[String] = {
    var backoff = InitialBackoffSec
    var attempts = 0
    while (attempts < cfg.maxAttemptsPerPage) {
      fetch() match {
        case Ok(body) => return Some(body)
        case _ =>
          cfg.sleep(backoff)
          backoff = math.min(backoff * 2, MaxBackoffSec)
          attempts += 1
      }
    }
    None
  }

  /** Full crawl: returns number of pages written. */
  def crawl(cfg: Config): Int = {
    val banner = fetchWithRetry(cfg, cfg.fetchSearch)
      .getOrElse(throw new RuntimeException("search page unreachable"))
    val top = parseTopPage(banner)
      .getOrElse(throw new RuntimeException("could not determine page count")) // scrape.py:60-61
    var written = 0
    // scrape.py:63-67 fetches 1 until top_page (exclusive)
    (1 until top).foreach { n =>
      fetchWithRetry(cfg, () => cfg.fetchPage(n)).foreach { body =>
        cfg.writePage(n, s"### PAGE $n ####\n" + body)
        written += 1
      }
    }
    written
  }
}
