package graft

import graft.sources.Crawl

/** Pins the crawler control-flow semantics (S1/S2/S4) from the reference:
  * stop on empty page, stop at page cap, retry-with-backoff then give up,
  * seen-ID skip across and within runs.
  */
class CrawlSpec extends SparkSpec {

  private val noSleep = Crawl.Config(maxPages = 5, retries = 3, backoff = _ => ())

  private def page(ids: String*): Seq[(String, String)] =
    ids.map(id => id -> s"""{"list_id": "$id"}""")

  test("stops on the first empty page") {
    val pages = Map(0 -> page("a", "b"), 1 -> page("c"), 2 -> page())
    val r = Crawl.run(pages(_), Set.empty, noSleep)
    assert(r.newIds == Vector("a", "b", "c"))
    assert(r.pagesFetched == 2)
  }

  test("stops at the page cap") {
    val r = Crawl.run(p => page(s"id$p"), Set.empty, noSleep)
    assert(r.pagesFetched == 5)
    assert(r.newIds.size == 5)
  }

  test("retries a failing page with backoff, then succeeds") {
    var calls = 0
    var backoffs = List.empty[Int]
    val cfg = noSleep.copy(backoff = a => backoffs ::= a)
    val fetch: Int => Seq[(String, String)] = {
      case 0 =>
        calls += 1
        if (calls < 3) sys.error("flaky") else page("a")
      case _ => page()
    }
    val r = Crawl.run(fetch, Set.empty, cfg)
    assert(r.newIds == Vector("a"))
    assert(r.retriesUsed == 2)
    assert(backoffs.sorted == List(1, 2)) // exponential ladder attempts
  }

  test("gives up after exhausting retries and commits what it has") {
    val fetch: Int => Seq[(String, String)] = {
      case 0 => page("a")
      case _ => sys.error("down")
    }
    val r = Crawl.run(fetch, Set.empty, noSleep)
    assert(r.newIds == Vector("a"))
    assert(r.retriesUsed == 3)
  }

  test("skips already-seen ids across and within runs") {
    val pages = Map(0 -> page("a", "b", "a"), 1 -> page("b", "c"), 2 -> page())
    val r = Crawl.run(pages(_), seen = Set("a"), noSleep)
    assert(r.newIds == Vector("b", "c"))
  }

  test("crawled records land in Spark as one JSON dataset") {
    import spark.implicits._
    val pages = Map(0 -> page("1", "2"), 1 -> page("3"), 2 -> page())
    val r = Crawl.run(pages(_), Set.empty, noSleep)
    val df = spark.read.json(r.records.toDS())
    assert(df.count() == 3)
    assert(df.columns.contains("list_id"))
  }
}
