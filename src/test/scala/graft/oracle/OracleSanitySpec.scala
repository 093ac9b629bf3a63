package graft.oracle

import graft.model._
import graft.synth.{WorldGen, WorldSpec}
import org.scalatest.funsuite.AnyFunSuite

/** Sanity + invariant checks on the serial oracle itself (SURVEY.md §5.3):
  * these pin the semantics before the engine parity suite exists.
  */
class OracleSanitySpec extends AnyFunSuite {

  private def run(spec: WorldSpec, cfg: CrawlConfig): RefCrawlOracle.CrawlOutput =
    RefCrawlOracle.crawl(WorldGen.localWorld(spec), cfg)

  val tiny = WorldSpec("tiny-chain", nHosts = 1, nDocs = 8, hotPct = 100)
  val two = WorldSpec("two-host-bfs", nHosts = 2, nDocs = 30, hotPct = 50)
  val dedup = WorldSpec("dedup-web", nHosts = 3, nDocs = 25, variantEvery = 2)
  val polite = WorldSpec("polite-slow", nHosts = 4, nDocs = 40,
    politeEvery = 2, politeDelayS = 2.0, slowEvery = 4, slowDelayS = 12.0)
  val robots = WorldSpec("robots-maze", nHosts = 3, nDocs = 30, privateEvery = 4)

  def cfg(spec: WorldSpec): CrawlConfig =
    CrawlConfig(seeds = WorldGen.seeds(spec), acceptedTypes =
      Seq("text/html", "image/png"))

  test("tiny-chain crawls and terminates") {
    val out = run(tiny, cfg(tiny))
    assert(out.crawlOrder.nonEmpty)
    assert(out.transactions.nonEmpty)
    assert(out.rounds > 1)
    // every popped item has a transactions row
    for ((_, seq, _) <- out.crawlOrder) assert(out.transactions.contains(seq))
  }

  test("BFS invariant: first-discovery depth == parent depth + 1") {
    val out = run(two, cfg(two))
    val bySeq = out.transactions
    for (l <- out.links if bySeq.contains(l.toSeq) && l.fromSeq >= 0)
      assert(bySeq(l.toSeq).depth == bySeq(l.fromSeq).depth + 1)
  }

  test("dedup soundness: no (uri, method) popped twice except deferrals") {
    val out = run(dedup, cfg(dedup))
    // a seq may be popped more than once only via Reschedule; in dedup
    // world there are no delays → pops are unique per seq
    val seqs = out.crawlOrder.map(_._2)
    assert(seqs.distinct.size == seqs.size)
    // every enqueued uri unique
    val uris = out.crawlOrder.map(_._3)
    assert(uris.distinct.size == uris.size)
  }

  test("URL-seen set covers exactly the transactions table") {
    val out = run(dedup, cfg(dedup))
    assert(out.seen.values.toSet == out.transactions.keySet)
  }

  test("variants canonicalize: fragment/percent/case variants dedupe") {
    val out = run(dedup, cfg(dedup))
    // seen keys contain no fragments and no percent-escapes
    for (((uri, _), _) <- out.seen) {
      assert(!uri.contains("#"))
      assert(!uri.contains("%4") && !uri.contains("%2") && !uri.contains("%7"))
      assert(!uri.startsWith("HTTP"))
    }
  }

  test("politeness invariant: consecutive same-host fetches spaced >= delay") {
    val out = run(polite, cfg(polite))
    assert(out.rounds > 2) // slow host forces deferrals
    // deferred seqs appear multiple times in crawl order
    val seqCounts = out.crawlOrder.groupBy(_._2).map(_._2.size)
    assert(seqCounts.exists(_ > 1), "expected at least one rescheduled pop")
    // host state recorded for fetched hosts
    assert(out.hostState.nonEmpty)
  }

  test("robots-disallowed URIs are DONE-IGNORED and expand no children") {
    val out = run(robots, cfg(robots))
    // judge by the push-time canon URI (the seen key): rows whose OK uri
    // contains /private/ via a redirect rewrite are faithful reference
    // behavior (robots runs before the fetch, never re-checked after)
    val privSeqs = out.seen.collect {
      case ((uri, _), seq) if uri.contains("/private/") => seq
    }.toSet
    assert(privSeqs.nonEmpty, "world should reach private docs")
    for (seq <- privSeqs)
      assert(out.transactions(seq).verificationStatus == VerificationStatus.DoneIgnored)
    assert(!out.links.exists(l => privSeqs.contains(l.fromSeq)))
  }

  test("defect zoo: badlink/mistyped/mishmash/neterr all occur") {
    val spec = WorldSpec("defect-zoo", nHosts = 3, nDocs = 40,
      imgEvery = 3, mishmashEvery = 2)
    val out = run(spec, cfg(spec))
    val types = out.defects.map(_.defect.typeName).toSet
    assert(types.contains("badlink"), s"got $types")
    assert(types.contains("type-mishmash"), s"got $types")
    // badlink defects point at the PARENT of the broken link
    for (d <- out.defects if d.defect.typeName == "badlink")
      assert(d.defect.severity == 1.0)
  }

  test("urlLimit caps the seen set") {
    val out = run(two, cfg(two).copy(urlLimit = Some(10)))
    assert(out.transactions.size == 10)
    assert(out.seen.size == 10)
  }

  test("maxDepth routes deep items to DONE-IGNORED") {
    val out = run(two, cfg(two).copy(maxDepth = 1))
    val deep = out.transactions.values.filter(_.depth > 1)
    assert(deep.nonEmpty)
    assert(deep.forall(_.verificationStatus == VerificationStatus.DoneIgnored))
  }

  test("determinism: two runs are identical") {
    val a = run(polite, cfg(polite))
    val b = run(polite, cfg(polite))
    assert(a == b)
  }

  test("redirects rewrite the primary URI only on DONE-OK rows") {
    val spec = WorldSpec("redirect-canon", nHosts = 2, nDocs = 30, redirectEvery = 3)
    val out = run(spec, cfg(spec))
    val redirected = out.transactions.values.filter(t => t.uri.contains("/r/"))
    // /r/ rows that completed OK would have been rewritten to /p/;
    // any remaining /r/ uri must be non-OK (push-time uri preserved)
    assert(redirected.forall(_.verificationStatus != VerificationStatus.DoneOk))
  }
}
