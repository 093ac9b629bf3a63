package graft.url

import java.nio.charset.StandardCharsets

/** Pure URL functions mirroring the exact Python `urllib.parse` semantics
  * the reference relies on (SURVEY.md §2.2 P1-P5, P10-P12):
  *
  *  - unquote²  at transaction creation (transaction.py:111)
  *  - urldefrag at queue push           (transaction.py:152)
  *  - quote     of discovered links     (links_finder_plugin.py:61)
  *  - urljoin   base resolution         (links_finder_plugin.py:56)
  *  - scheme allow-list                 (links_finder_plugin.py:57-59)
  *  - robots_url derivation             (robots.py:43)
  *
  * Behavior is pinned by fixtures generated from CPython's public
  * urllib.parse (src/test/resources/url_fixtures.tsv). These functions
  * are shared by the serial oracle AND the Spark engine (wrapped as
  * expressions in [[UrlExpressions]]), so engine-vs-oracle parity is
  * independent of any residual deviation from CPython corner cases.
  */
object UrlFuncs {

  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F')

  /** Python urllib.parse.unquote(s) — decode %XX byte sequences as UTF-8
    * with errors='replace'; '+' is NOT touched; lone/invalid '%' kept.
    */
  def unquote(s: String): String = {
    if (s == null || !s.contains('%')) return s
    val out = new StringBuilder(s.length)
    val bytes = new java.io.ByteArrayOutputStream()
    def flush(): Unit = if (bytes.size() > 0) {
      // UTF-8 decode with replacement (Python errors='replace')
      val dec = StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(java.nio.charset.CodingErrorAction.REPLACE)
        .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPLACE)
      out.append(dec.decode(java.nio.ByteBuffer.wrap(bytes.toByteArray)).toString)
      bytes.reset()
    }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length && isHex(s.charAt(i + 1)) && isHex(s.charAt(i + 2))) {
        bytes.write(Integer.parseInt(s.substring(i + 1, i + 3), 16))
        i += 3
      } else {
        flush()
        out.append(c)
        i += 1
      }
    }
    flush()
    out.toString
  }

  /** unquote(unquote(s)) — the double decode at createTransaction
    * (transaction.py:111).
    */
  def unquote2(s: String): String = unquote(unquote(s))

  private val AlwaysSafe: Array[Boolean] = {
    val a = new Array[Boolean](128)
    for (c <- 'a' to 'z') a(c) = true
    for (c <- 'A' to 'Z') a(c) = true
    for (c <- '0' to '9') a(c) = true
    for (c <- "_.-~") a(c) = true
    a
  }

  /** Python urllib.parse.quote(s) with the default safe="/": UTF-8
    * encode, percent-encode every byte outside [A-Za-z0-9_.-~/].
    */
  def quote(s: String): String = quote(s, "/")

  def quote(s: String, safe: String): String = {
    if (s == null) return null
    val out = new StringBuilder(s.length)
    for (b <- s.getBytes(StandardCharsets.UTF_8)) {
      val ub = b & 0xff
      if (ub < 128 && (AlwaysSafe(ub) || safe.indexOf(ub.toChar) >= 0)) out.append(ub.toChar)
      else out.append(f"%%${ub}%02X")
    }
    out.toString
  }

  /** Python urllib.parse.quote_plus: safe='' with space → '+'. */
  def quotePlus(s: String): String = {
    if (s == null) return null
    quote(s, " ").replace(" ", "+")
  }

  /** Python urllib.parse.urlencode over an ordered pair list
    * (quote_via=quote_plus default; net.py:200-207 appends this to the
    * request URL for GET/HEAD with data).
    */
  def urlencode(data: Seq[(String, String)]): String =
    data.map { case (k, v) => quotePlus(k) + "=" + quotePlus(v) }.mkString("&")

  /** Python urllib.parse.urldefrag(s)._1 — strip from the first '#'. */
  def defrag(s: String): String = {
    if (s == null) return null
    val i = s.indexOf('#')
    if (i < 0) s else s.substring(0, i)
  }

  /** Split-parse per Python urlsplit: (scheme, netloc, rest-after-netloc).
    * scheme is lowercased; empty string when absent.
    */
  def splitUrl(s: String): (String, String, String) = {
    var rest = s
    var scheme = ""
    val ci = rest.indexOf(':')
    if (ci > 0) {
      val cand = rest.substring(0, ci)
      if (cand.charAt(0).isLetter && cand.forall(c => c.isLetterOrDigit || c == '+' || c == '-' || c == '.'))
        { scheme = cand.toLowerCase; rest = rest.substring(ci + 1) }
    }
    var netloc = ""
    if (rest.startsWith("//")) {
      var j = 2
      while (j < rest.length && rest.charAt(j) != '/' && rest.charAt(j) != '?' && rest.charAt(j) != '#') j += 1
      netloc = rest.substring(2, j)
      rest = rest.substring(j)
    }
    (scheme, netloc, rest)
  }

  /** Scheme of a URL, lowercased ("" when absent) — urlparse(u).scheme. */
  def scheme(s: String): String = splitUrl(s)._1

  /** Netloc/host of a URL ("" when absent) — urlparse(u).netloc,
    * lowercased for use as the politeness/robots partition key.
    */
  def host(s: String): String = splitUrl(s)._2.toLowerCase

  /** reppy's Robots.robots_url (robots.py:43): scheme://netloc/robots.txt */
  def robotsUrl(s: String): String = {
    val (sch, netloc, _) = splitUrl(s)
    s"$sch://$netloc/robots.txt"
  }

  private val UsesRelative =
    Set("", "ftp", "http", "gopher", "nntp", "imap", "wais", "file", "https", "shttp",
      "mms", "prospero", "rtsp", "rtspu", "sftp", "svn", "svn+ssh", "ws", "wss")
  private val UsesNetloc =
    Set("", "ftp", "http", "gopher", "nntp", "telnet", "imap", "wais", "file", "mms",
      "https", "shttp", "snews", "prospero", "rtsp", "rtspu", "rsync", "svn",
      "svn+ssh", "sftp", "nfs", "git", "git+ssh", "ws", "wss", "itms-services")

  /** Python urllib.parse.urljoin(base, url) — RFC 3986 §5 resolution with
    * CPython's legacy quirks (same-scheme refs treated as relative for
    * schemes in uses_relative; interior empty segments of merged relative
    * paths dropped).
    */
  def urljoin(base: String, url: String): String = {
    if (base == null || base.isEmpty) return url
    if (url == null || url.isEmpty) return base
    val (bscheme, bnetloc, brest) = splitUrl(base)
    val (uschemeRaw, unetloc0, urest0) = splitUrl(url)
    val uscheme = if (uschemeRaw.isEmpty) bscheme else uschemeRaw
    if (uscheme != bscheme || !UsesRelative.contains(uscheme)) return url
    var netloc = unetloc0
    // split rest into (path, query, fragment)
    def splitRest(r: String): (String, String, String) = {
      var rest = r
      var frag = ""
      val fi = rest.indexOf('#')
      if (fi >= 0) { frag = rest.substring(fi + 1); rest = rest.substring(0, fi) }
      var query = ""
      val qi = rest.indexOf('?')
      if (qi >= 0) { query = rest.substring(qi + 1); rest = rest.substring(0, qi) }
      (rest, query, frag)
    }
    val (bpath, bquery, _) = splitRest(brest)
    val (upath, uquery, ufrag) = splitRest(urest0)
    def unsplit(scheme: String, netloc: String, path: String, query: String, frag: String): String = {
      val sb = new StringBuilder
      if (scheme.nonEmpty) { sb.append(scheme).append(':') }
      // Python urlunsplit: add '//' if netloc, or if path starts with '//'
      if (netloc.nonEmpty || (path.startsWith("//"))) {
        sb.append("//").append(netloc)
        if (path.nonEmpty && !path.startsWith("/")) sb.append('/')
      }
      sb.append(path)
      if (query.nonEmpty) sb.append('?').append(query)
      if (frag.nonEmpty) sb.append('#').append(frag)
      sb.toString
    }
    if (UsesNetloc.contains(uscheme)) {
      if (netloc.nonEmpty) return unsplit(uscheme, netloc, upath, uquery, ufrag)
      netloc = bnetloc
    }
    if (upath.isEmpty) {
      val q = if (uquery.nonEmpty) uquery else bquery
      return unsplit(uscheme, netloc, bpath, q, ufrag)
    }
    val segments: Array[String] =
      if (upath.startsWith("/")) upath.split("/", -1)
      else {
        val baseParts0 = bpath.split("/", -1)
        val baseParts = if (baseParts0.nonEmpty && baseParts0.last != "") baseParts0.dropRight(1) else baseParts0
        val merged = baseParts ++ upath.split("/", -1)
        // CPython: segments[1:-1] = filter(None, segments[1:-1])
        if (merged.length > 2)
          Array(merged.head) ++ merged.slice(1, merged.length - 1).filter(_.nonEmpty) ++ Array(merged.last)
        else merged
      }
    val resolved = scala.collection.mutable.ArrayBuffer.empty[String]
    for (seg <- segments) {
      if (seg == "..") { if (resolved.nonEmpty) resolved.remove(resolved.length - 1) }
      else if (seg == ".") ()
      else resolved += seg
    }
    if (segments.nonEmpty && (segments.last == "." || segments.last == ".."))
      resolved += ""
    val path = {
      val p = resolved.mkString("/")
      if (p.isEmpty && netloc.nonEmpty) "/" else p
    }
    unsplit(uscheme, netloc, path, uquery, ufrag)
  }

  /** The reference's full discovered-link canonicalization
    * (links_finder_plugin.py:56-66 → transaction.py:111, 152):
    * urljoin → quote → unquote² → defrag. Since unquote∘quote = id,
    * this reduces to defrag(unquote(urljoin(base, href))).
    */
  def canonLink(baseUri: String, href: String): String =
    defrag(unquote2(quote(urljoin(baseUri, href))))

  /** Seed canonicalization (core.py:55-61 → createTransaction →
    * push/defrag): defrag(unquote²(seed)).
    */
  def canonSeed(seed: String): String = defrag(unquote2(seed))

  /** URI validity per the reference's rfc3987.match(uri) gate
    * (core.py:103-110). Approximation of the IRI grammar sufficient for
    * the synthetic URL space: requires a scheme and rejects characters
    * outside the (i)unreserved/reserved/pct sets — notably whitespace
    * (which appears after the double-unquote of %20 links; the reference
    * rejects those as `invaliduri` too).
    */
  private val IriPattern =
    "^[a-zA-Z][a-zA-Z0-9+.-]*:[^\\s<>\"{}|\\\\^`]*$".r.pattern

  def isValidIri(s: String): Boolean = s != null && IriPattern.matcher(s).matches()

  /** RFC 3986 §6 normalization approximating the url_normalize package
    * used by the optional uri_normalizer filter (uri_normalizer.py:22-27):
    * lowercase scheme+host, drop default port, remove dot segments,
    * uppercase %XX triplets, decode unreserved percent-escapes, empty
    * path → "/". Shared by oracle and engine; OFF by default (the filter
    * is config-gated in the reference too).
    */
  def urlNormalize(s: String): String = {
    if (s == null || s.isEmpty) return s
    val (sch, netloc0, rest) = splitUrl(s)
    if (sch != "http" && sch != "https") return s
    var netloc = netloc0.toLowerCase
    if ((sch == "http" && netloc.endsWith(":80")) || (sch == "https" && netloc.endsWith(":443")))
      netloc = netloc.substring(0, netloc.lastIndexOf(':'))
    var frag = ""
    var r = rest
    val fi = r.indexOf('#'); if (fi >= 0) { frag = r.substring(fi); r = r.substring(0, fi) }
    var query = ""
    val qi = r.indexOf('?'); if (qi >= 0) { query = r.substring(qi); r = r.substring(0, qi) }
    // normalize percent escapes: uppercase hex, decode unreserved
    def normEsc(p: String): String = {
      val out = new StringBuilder(p.length)
      var i = 0
      while (i < p.length) {
        val c = p.charAt(i)
        if (c == '%' && i + 2 < p.length && isHex(p.charAt(i + 1)) && isHex(p.charAt(i + 2))) {
          val v = Integer.parseInt(p.substring(i + 1, i + 3), 16)
          if (v < 128 && AlwaysSafe(v)) out.append(v.toChar)
          else out.append('%').append(p.substring(i + 1, i + 3).toUpperCase)
          i += 3
        } else { out.append(c); i += 1 }
      }
      out.toString
    }
    var path = normEsc(r)
    // remove dot segments (RFC 3986 §5.2.4)
    if (path.nonEmpty) {
      val segs = path.split("/", -1)
      val outSegs = scala.collection.mutable.ArrayBuffer.empty[String]
      for ((seg, i) <- segs.zipWithIndex) {
        if (seg == "..") {
          if (outSegs.nonEmpty && outSegs.last != "") outSegs.remove(outSegs.length - 1)
        } else if (seg == ".") ()
        else outSegs += seg
      }
      if (segs.last == "." || segs.last == "..") outSegs += ""
      path = outSegs.mkString("/")
    }
    if (path.isEmpty) path = "/"
    s"$sch://$netloc$path${normEsc(query)}$frag"
  }
}
