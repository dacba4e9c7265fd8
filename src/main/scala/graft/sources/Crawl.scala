package graft.sources

import scala.util.{Failure, Success, Try}

/** The reference crawler's control flow (S1/S2/S4, reference
  * app/bronze.py:50-136), re-expressed as pure driver-side logic with the
  * transport injected — pagination that stops on an empty page or a page
  * cap, per-request retry with exponential backoff, and seen-ID dedup
  * before commit. No HTTP here by design: ingestion transport sits
  * outside the engine (SURVEY §2.1); the engine-relevant semantics are
  * the stop/retry/dedup protocol, which CrawlSpec pins against the
  * reference's behavior table.
  */
object Crawl {

  final case class Config(
      maxPages: Int = 200,
      retries: Int = 3,
      /** backoff(attempt) sleep hook — injectable so tests don't sleep;
        * the reference sleeps 2^attempt seconds (bronze.py:97). */
      backoff: Int => Unit = a => Thread.sleep((1L << a) * 1000))

  final case class Result(
      records: Vector[String],
      newIds: Vector[String],
      pagesFetched: Int,
      retriesUsed: Int)

  /** Crawl pages until an empty page or the page cap, retrying each page
    * up to `retries` times with backoff; keep only records whose id is
    * not in `seen` (first occurrence wins within the run, like the
    * reference's in-memory set).
    *
    * @param fetchPage page index -> (id, record) pairs; throws on failure
    */
  def run(
      fetchPage: Int => Seq[(String, String)],
      seen: Set[String],
      config: Config = Config()): Result = {
    var page = 0
    var retriesUsed = 0
    val records = Vector.newBuilder[String]
    val newIds = Vector.newBuilder[String]
    var sessionSeen = seen
    var done = false
    while (!done && page < config.maxPages) {
      var attempt = 0
      var fetched: Option[Seq[(String, String)]] = None
      while (fetched.isEmpty && attempt < config.retries) {
        Try(fetchPage(page)) match {
          case Success(rows) => fetched = Some(rows)
          case Failure(_) =>
            attempt += 1
            retriesUsed += 1
            if (attempt < config.retries) config.backoff(attempt)
        }
      }
      fetched match {
        case None => done = true // page failed after all retries: stop the run
        case Some(rows) if rows.isEmpty => done = true // empty page = end
        case Some(rows) =>
          rows.foreach { case (id, rec) =>
            if (!sessionSeen.contains(id)) {
              sessionSeen += id
              records += rec
              newIds += id
            }
          }
          page += 1
      }
    }
    Result(records.result(), newIds.result(), page, retriesUsed)
  }
}
