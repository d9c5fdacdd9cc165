package graft.functions

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.{CodingErrorAction, StandardCharsets}
import java.util.Locale

/** Faithful port of the CPython 3.11 `urllib.parse` primitives the reference
  * engine builds on (`src/url_utils.py:1-47`, `src/risk_rules.py:64-69` use
  * `urlparse`/`parse_qsl`/`urlencode`): scheme detection, netloc split,
  * params split, WHATWG control-char stripping, `hostname` extraction,
  * `parse_qsl` with UTF-8 `unquote(errors="replace")`, and `quote_plus`.
  *
  * `java.net.URI` is NOT a substitute: it throws on unencoded spaces, returns
  * a null host for underscore/IDN hostnames, and keeps `;params` in the path —
  * all places Python's string-splitting parser happily proceeds. Since the
  * reference classifies real-world (messy) URLs, label parity requires the
  * Python semantics exactly.
  */
object PyUrl {

  /** Mirrors `ValueError("Invalid IPv6 URL")` / bad bracketed hosts. */
  final class InvalidUrlException(msg: String) extends Exception(msg)

  /** `ParseResult` fields (port is folded into netloc; callers split). */
  final case class Parsed(
      scheme: String,
      netloc: String,
      path: String,
      params: String,
      query: String,
      fragment: String) {

    /** `ParseResult.hostname`: after last '@', bracketed IPv6 or up to ':',
      * lowercased; Python's `None` maps to "". */
    def hostname: String = {
      val hostinfo = netloc.substring(netloc.lastIndexOf('@') + 1)
      val br = hostinfo.indexOf('[')
      val host =
        if (br >= 0) {
          val rest = hostinfo.substring(br + 1)
          val close = rest.indexOf(']')
          if (close >= 0) rest.substring(0, close) else rest
        } else {
          val colon = hostinfo.indexOf(':')
          if (colon >= 0) hostinfo.substring(0, colon) else hostinfo
        }
      // Locale.ROOT: Python str.lower() is locale-independent; a tr_TR
      // default locale would dot-strip 'I' and fork hash keys per executor
      host.toLowerCase(Locale.ROOT)
    }
  }

  private def isSchemeChar(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'

  // uses_params (urllib/parse.py): schemes whose last path segment may carry
  // `;params`
  private val UsesParams = Set("", "ftp", "hdl", "prospero", "http", "imap",
    "https", "shttp", "rtsp", "rtspu", "sip", "sips", "mms", "sftp", "tel")

  private def findDelim(s: String, from: Int): Int = {
    var i = from
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '/' || c == '?' || c == '#') return i
      i += 1
    }
    s.length
  }

  /** `urlsplit` (urllib/parse.py:436-497): WHATWG lstrip + tab/CR/LF removal,
    * scheme (first char ASCII alpha), `//netloc`, `#fragment`, `?query`. */
  def urlsplit(urlIn: String): Parsed = {
    var url = Option(urlIn).getOrElse("")
    // lstrip C0 control or space, then drop \t \r \n everywhere
    var start = 0
    while (start < url.length && url.charAt(start) <= ' ') start += 1
    url = url.substring(start).filterNot(c => c == '\t' || c == '\r' || c == '\n')

    var scheme = ""
    val i = url.indexOf(':')
    if (i > 0 && url.charAt(0).isLetter && url.charAt(0) < 128 &&
      url.substring(0, i).forall(isSchemeChar)) {
      scheme = url.substring(0, i).toLowerCase(Locale.ROOT)
      url = url.substring(i + 1)
    }

    var netloc = ""
    if (url.startsWith("//")) {
      val delim = findDelim(url, 2)
      netloc = url.substring(2, delim)
      url = url.substring(delim)
      val hasOpen = netloc.contains('[')
      val hasClose = netloc.contains(']')
      if (hasOpen != hasClose) throw new InvalidUrlException("Invalid IPv6 URL")
      if (hasOpen && hasClose) checkBracketedHost(
        netloc.substring(netloc.indexOf('[') + 1, netloc.indexOf(']')))
      checkNetloc(netloc)
    }

    var fragment = ""
    val h = url.indexOf('#')
    if (h >= 0) { fragment = url.substring(h + 1); url = url.substring(0, h) }
    var query = ""
    val q = url.indexOf('?')
    if (q >= 0) { query = url.substring(q + 1); url = url.substring(0, q) }
    Parsed(scheme, netloc, url, "", query, fragment)
  }

  /** `_checknetloc`: a non-ASCII netloc whose NFKC normalization introduces
    * one of `/?#@:` raises ValueError in CPython (spoofing guard) — the
    * reference then errors out of normalize/hostname for such URLs. */
  private def checkNetloc(netloc: String): Unit = {
    if (netloc.isEmpty || netloc.forall(_ < 128)) return
    val n = netloc.replace("@", "").replace(":", "").replace("#", "").replace("?", "")
    val n2 = java.text.Normalizer.normalize(n, java.text.Normalizer.Form.NFKC)
    if (n != n2 && "/?#@:".exists(c => n2.indexOf(c) >= 0))
      throw new InvalidUrlException("netloc contains invalid characters under NFKC")
  }

  /** `_check_bracketed_host`: IPvFuture `v<hex>.<...>` allowed, otherwise the
    * host must parse as IPv6 (an IPv4 in brackets raises). Approximated with
    * shape checks (hex/colon/zone chars, >=2 colons) — exactness only matters
    * for the raise-vs-not decision on rare bracketed hosts. */
  private def checkBracketedHost(host: String): Unit = {
    // CPython special-cases LOWERCASE 'v' only; "Vdead.beef" falls through
    // to ip_address() and raises
    if (host.nonEmpty && host.charAt(0) == 'v') {
      if (!host.matches("v[a-fA-F0-9]+\\..+"))
        throw new InvalidUrlException("IPvFuture address is invalid")
    } else {
      val body = host.takeWhile(_ != '%') // zone-id suffix allowed
      val ipv6Shape = body.count(_ == ':') >= 2 &&
        body.forall(c => c.isDigit || c == ':' || c == '.' ||
          (c >= 'a' && c <= 'f') || (c >= 'A' && c <= 'F'))
      if (!ipv6Shape) throw new InvalidUrlException("bad bracketed host")
    }
  }

  /** `_splitparams`: `;params` off the LAST path segment. */
  private def splitParams(url: String): (String, String) = {
    val slash = url.lastIndexOf('/')
    val i = if (slash >= 0) url.indexOf(';', slash) else url.indexOf(';')
    if (i < 0) (url, "") else (url.substring(0, i), url.substring(i + 1))
  }

  /** `urlparse`: urlsplit + params split for `uses_params` schemes. */
  def urlparse(urlIn: String): Parsed = {
    val p = urlsplit(urlIn)
    if (UsesParams.contains(p.scheme) && p.path.contains(';')) {
      val (path, params) = splitParams(p.path)
      p.copy(path = path, params = params)
    } else p
  }

  /** `urlparse(url).hostname or ""` with Python's raise → "" contract NOT
    * applied (callers decide); throws [[InvalidUrlException]] like CPython. */
  def hostnameOf(url: String): String = urlparse(url).hostname

  private def hexVal(c: Char): Int =
    if (c >= '0' && c <= '9') c - '0'
    else if (c >= 'a' && c <= 'f') c - 'a' + 10
    else if (c >= 'A' && c <= 'F') c - 'A' + 10
    else -1

  /** `unquote(s, encoding="utf-8", errors="replace")`: maximal `%XX` byte
    * runs decoded as UTF-8 with U+FFFD replacement; stray '%' kept literal. */
  def unquote(s: String): String = {
    if (!s.contains('%')) return s
    val out = new StringBuilder(s.length)
    val bytes = new ByteArrayOutputStream()
    val decoder = StandardCharsets.UTF_8.newDecoder()
      .onMalformedInput(CodingErrorAction.REPLACE)
      .onUnmappableCharacter(CodingErrorAction.REPLACE)
    def flush(): Unit = if (bytes.size > 0) {
      out.append(decoder.decode(ByteBuffer.wrap(bytes.toByteArray)).toString)
      bytes.reset()
    }
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
        hexVal(s.charAt(i + 1)) >= 0 && hexVal(s.charAt(i + 2)) >= 0) {
        bytes.write(hexVal(s.charAt(i + 1)) * 16 + hexVal(s.charAt(i + 2)))
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

  /** `parse_qsl(qs, keep_blank_values=True)`: '&'-split, '+' → space, then
    * unquote; bare keys become (key, ""). */
  def parseQsl(qs: String): Seq[(String, String)] =
    Option(qs).getOrElse("").split("&", -1).toSeq.filter(_.nonEmpty).map { nv =>
      val eq = nv.indexOf('=')
      val (k, v) = if (eq < 0) (nv, "") else (nv.substring(0, eq), nv.substring(eq + 1))
      (unquote(k.replace('+', ' ')), unquote(v.replace('+', ' ')))
    }

  /** `quote_plus(s, safe='')`: unreserved ASCII kept, space → '+', rest
    * UTF-8 `%XX` uppercase. */
  def quotePlus(s: String): String = {
    val sb = new StringBuilder
    s.getBytes(StandardCharsets.UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      if (c < 128 && (c.isLetterOrDigit || c == '-' || c == '_' || c == '.' || c == '~'))
        sb.append(c)
      else if (c == ' ') sb.append('+')
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** Python-compatible string ordering: tuples sort by Unicode CODE POINT,
    * while Java's String.compareTo compares UTF-16 code units — they differ
    * when a non-BMP character (surrogate pair) meets a char in
    * [U+E000, U+FFFF]. */
  val codePointOrdering: Ordering[String] = (a: String, b: String) => {
    var i = 0; var j = 0
    var res = 0
    while (res == 0 && i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) res = Integer.compare(ca, cb)
      else { i += Character.charCount(ca); j += Character.charCount(cb) }
    }
    if (res != 0) res else Integer.compare(a.length - i, b.length - j)
  }

  /** tuple-of-two-strings ordering matching Python's `list.sort()`. */
  val pairOrdering: Ordering[(String, String)] =
    Ordering.Tuple2(codePointOrdering, codePointOrdering)

  /** `urlencode(pairs, doseq=True)` over string pairs. */
  def urlencode(pairs: Seq[(String, String)]): String =
    pairs.map { case (k, v) => s"${quotePlus(k)}=${quotePlus(v)}" }.mkString("&")

  // uses_netloc (urllib/parse.py): schemes that get "//" even with an empty
  // netloc — so normalize("example.com/path") is "http:///example.com/path"
  private val UsesNetloc = Set("", "ftp", "http", "gopher", "nntp", "telnet",
    "imap", "wais", "file", "mms", "https", "shttp", "snews", "prospero",
    "rtsp", "rtspu", "rsync", "svn", "svn+ssh", "sftp", "nfs", "git",
    "git+ssh", "ws", "wss")

  /** `urlunsplit` (urllib/parse.py:576-590). */
  def urlunsplit(scheme: String, netloc: String, pathIn: String,
      query: String, fragment: String): String = {
    var url = pathIn
    if (netloc.nonEmpty ||
      (scheme.nonEmpty && UsesNetloc.contains(scheme) && !url.startsWith("//"))) {
      if (url.nonEmpty && !url.startsWith("/")) url = "/" + url
      url = "//" + netloc + url
    }
    if (scheme.nonEmpty) url = scheme + ":" + url
    if (query.nonEmpty) url = url + "?" + query
    if (fragment.nonEmpty) url = url + "#" + fragment
    url
  }
}
