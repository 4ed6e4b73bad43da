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

  /** Reference endpoints (scrape.py:14-15); the blank-query instance.
    * Both ingester options the registry's REST surface declares
    * (SURVEY §2.1 S3) are named here: `query=` (paginated full
    * download, magicString.txt:3) and `eudracts=` (by-EudraCT summary
    * download, magicString.txt:6). */
  val SearchUrl = "https://www.clinicaltrialsregister.eu/ctr-search/search?query="
  def pageUrl(n: Int): String = pageUrl(n, "")
  def pageUrl(n: Int, query: String): String =
    "https://www.clinicaltrialsregister.eu/ctr-search/rest/download/full" +
      s"?query=${enc(query)}&page=$n&mode=current_page"

  /** By-EudraCT summary endpoint (magicString.txt:6): ONE summary
    * document for a selected id set — no pagination, no banner. */
  def summaryUrl(eudracts: Seq[String]): String =
    "https://www.clinicaltrialsregister.eu/ctr-search/rest/download/summary" +
      s"?mode=selected&eudracts=${eudracts.map(enc).mkString(",")}"

  private def enc(s: String): String =
    java.net.URLEncoder.encode(s, java.nio.charset.StandardCharsets.UTF_8)

  /** Default live adapter: `java.net.http` with the reference's
    * timeouts (2 s connect; 5 s for the response — scrape.py:33 uses a
    * 5 s time-to-first-byte, JDK HttpRequest bounds the whole
    * exchange), one `page-NNNNNN.txt` file per page under `outDir` so
    * lexical file order IS corpus order for [[graft.registry.Corpus]].
    * NETWORK-REQUIRING — exercised nowhere in this sandbox; the crawl
    * policy itself (banner parse, retry/backoff, write framing) is
    * covered by ScraperSpec through injected fakes, which this adapter
    * merely plugs real I/O into. */
  def liveConfig(outDir: java.nio.file.Path,
                 searchUrl: String = SearchUrl,
                 page: Int => String = pageUrl): Config = {
    val client = java.net.http.HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(2))
      .followRedirects(java.net.http.HttpClient.Redirect.NORMAL)
      .build()
    def fetch(url: String): FetchResult =
      try {
        val req = java.net.http.HttpRequest.newBuilder(java.net.URI.create(url))
          .timeout(java.time.Duration.ofSeconds(5)).GET().build()
        val resp = client.send(req, java.net.http.HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() == 200) Ok(resp.body()) else HttpError(resp.statusCode())
      } catch {
        // interruption must CANCEL the crawl, not become a retriable error
        case e: InterruptedException => Thread.currentThread().interrupt(); throw e
        case scala.util.control.NonFatal(e) => ConnError(String.valueOf(e.getMessage))
      }
    java.nio.file.Files.createDirectories(outDir)
    Config(
      fetchSearch = () => fetch(searchUrl),
      fetchPage = n => fetch(page(n)),
      writePage = (n, body) => java.nio.file.Files.write(outDir.resolve(f"page-$n%06d.txt"),
        body.getBytes(java.nio.charset.StandardCharsets.UTF_8)),
      sleep = s => Thread.sleep((s * 1000).toLong))
  }

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

  /** By-EudraCT summary download mode (`eudracts=` — SURVEY §2.1 S3,
    * magicString.txt:6): a single retried fetch of the summary
    * endpoint, written behind the page-1 delimiter so
    * [[graft.registry.Corpus]] re-splits it exactly like a crawl
    * output. Returns pages written (1 or 0). Build a live config with
    * `liveConfig(outDir, searchUrl = summaryUrl(ids))` — the summary
    * document arrives through `fetchSearch`, the same injected slot
    * ScraperSpec drives with fakes. */
  def downloadSummary(cfg: Config): Int =
    fetchWithRetry(cfg, cfg.fetchSearch) match {
      case Some(body) => cfg.writePage(1, "### PAGE 1 ####\n" + body); 1
      case None => 0
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
