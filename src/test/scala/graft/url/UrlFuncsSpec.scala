package graft.url

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import java.util.Base64

/** Pins UrlFuncs to CPython urllib.parse behavior via generated fixtures
  * (src/test/resources/url_fixtures.tsv), plus property tests.
  */
class UrlFuncsSpec extends AnyFunSuite {

  /** Deterministic mini-forAll over a scalacheck Gen (no scalatestplus
    * bridge in the offline cache).
    */
  private def forAll[A](gen: Gen[A], n: Int = 300)(check: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      gen.apply(Gen.Parameters.default, seed).foreach(check)
      seed = seed.next
      i += 1
    }
  }

  private def d(s: String): String =
    new String(Base64.getDecoder.decode(s), java.nio.charset.StandardCharsets.UTF_8)

  private val fixtures: Seq[(String, String, String, String)] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/url_fixtures.tsv"), "UTF-8")
    try src.getLines().toList.map { line =>
      val parts = line.split("\t", -1)
      (parts(0), d(parts(1)), if (parts(2).isEmpty) "" else d(parts(2)), d(parts(3)))
    } finally src.close()
  }

  test("fixtures loaded") { assert(fixtures.size > 100) }

  for ((op, a, b, expected) <- fixtures) {
    test(s"$op(${a.take(40)}${if (b.nonEmpty) ", " + b.take(30) else ""}) == ${expected.take(40)}") {
      val got = op match {
        case "unquote"  => UrlFuncs.unquote(a)
        case "unquote2" => UrlFuncs.unquote2(a)
        case "quote"    => UrlFuncs.quote(a)
        case "urljoin"  => UrlFuncs.urljoin(a, b)
        case "defrag"   => UrlFuncs.defrag(a)
        case "scheme"   => UrlFuncs.scheme(a)
        case "netloc"   => UrlFuncs.splitUrl(a)._2
      }
      assert(got == expected)
    }
  }

  private val urlChars = Gen.oneOf(
    Gen.alphaNumChar, Gen.oneOf('/', '%', '#', '?', '&', '=', '.', '-', '_', '~', ' ', '+', ':'))
  private val genUrlish: Gen[String] =
    Gen.listOf(urlChars).map(cs => "http://h.test/" + cs.mkString)

  test("unquote(quote(s)) == s (quote is injective, unquote its left inverse)") {
    forAll(genUrlish) { s => assert(UrlFuncs.unquote(UrlFuncs.quote(s)) == s) }
  }

  test("defrag is idempotent") {
    forAll(genUrlish) { s => assert(UrlFuncs.defrag(UrlFuncs.defrag(s)) == UrlFuncs.defrag(s)) }
  }

  test("canonLink == defrag(unquote(urljoin)) reduction") {
    forAll(genUrlish) { s =>
      assert(UrlFuncs.canonLink("http://base.test/a/b", s) ==
        UrlFuncs.defrag(UrlFuncs.unquote(UrlFuncs.urljoin("http://base.test/a/b", s))))
    }
  }

  test("urlNormalize is idempotent") {
    forAll(genUrlish) { s =>
      val n = UrlFuncs.urlNormalize(s)
      assert(UrlFuncs.urlNormalize(n) == n)
    }
  }

  test("urlNormalize basics") {
    assert(UrlFuncs.urlNormalize("HTTP://Ex.TEST:80/a/./b/../c") == "http://ex.test/a/c")
    assert(UrlFuncs.urlNormalize("https://h.test:443/%7euser") == "https://h.test/~user")
    assert(UrlFuncs.urlNormalize("http://h.test") == "http://h.test/")
  }

  test("robotsUrl") {
    assert(UrlFuncs.robotsUrl("http://h.test:8080/a/b?q#f") == "http://h.test:8080/robots.txt")
  }
}
