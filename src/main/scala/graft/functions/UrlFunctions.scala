package graft.functions

import java.net.URI
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** URL canonicalization — the reference's dedup key for articles and SERP
  * results (reference `src/url_utils.py:5-47`: scheme/host lowercase, strip
  * `www.`, collapse `//` in path, drop tracking params (`utm_*`, `gaa_*`,
  * gclid/fbclid/...), sort remaining query pairs, drop fragment; url_hash =
  * sha256 of the normalized form; hostname per `src/risk_rules.py:64-69`).
  *
  * Implemented as Scala UDFs: the logic (query-pair parse/sort/encode) is
  * beyond native expressions. These sit on the *ingest* path (once per row at
  * write time, persisted as `url_hash`), not in hot read queries, so the
  * codegen fence a UDF creates is paid where it doesn't matter.
  */
object UrlFunctions {

  private val TrackingParams = Set(
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "igshid", "mc_cid", "mc_eid", "vero_id",
    "gaa_at", "gaa_n", "gaa_ts", "gaa_sig")

  private def pctEncode(s: String): String = {
    // urllib.urlencode semantics: quote_plus — space -> '+', safe chars kept
    val sb = new StringBuilder
    s.getBytes(StandardCharsets.UTF_8).foreach { b =>
      val c = (b & 0xff).toChar
      if (c.isLetterOrDigit || c == '-' || c == '_' || c == '.' || c == '~') sb.append(c)
      else if (c == ' ') sb.append('+')
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  private def pctDecode(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '+' => sb.append(' '); i += 1
        case '%' if i + 3 <= s.length =>
          try {
            sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
            i += 3
          } catch { case _: Exception => sb.append('%'); i += 1 }
        case c => sb.append(c); i += 1
      }
    }
    sb.toString
  }

  /** Port of `normalize_url` (`src/url_utils.py:12-40`). */
  def normalizeUrlImpl(url: String): String = {
    if (url == null) return ""
    val trimmed = url.trim
    if (trimmed.isEmpty) return ""
    // tolerate unparseable URLs like python's urlparse does (best effort)
    val (schemeRaw, netlocRaw, pathRaw, queryRaw) =
      try {
        val u = new URI(trimmed)
        (Option(u.getScheme).getOrElse(""),
          Option(u.getRawAuthority).getOrElse(""),
          Option(u.getRawPath).getOrElse(""),
          Option(u.getRawQuery).getOrElse(""))
      } catch {
        case _: Exception =>
          // manual split: scheme://netloc/path?query#fragment
          val noFrag = trimmed.split("#", 2)(0)
          val (sch, rest) = noFrag.split("://", 2) match {
            case Array(s, r) => (s, r)
            case _ => ("", noFrag)
          }
          val (auth, pathq) = rest.split("/", 2) match {
            case Array(a, p) => (a, "/" + p)
            case _ => (rest, "")
          }
          val (p, q) = pathq.split("\\?", 2) match {
            case Array(pp, qq) => (pp, qq)
            case _ => (pathq, "")
          }
          (sch, auth, p, q)
      }

    val scheme = (if (schemeRaw.isEmpty) "http" else schemeRaw).toLowerCase
    var netloc = netlocRaw.toLowerCase
    if (netloc.startsWith("www.")) netloc = netloc.substring(4)
    val path = pathRaw.replaceAll("//+", "/")

    val pairs = queryRaw.split("&").toSeq
      .filter(_.nonEmpty)
      .map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => (pctDecode(k), pctDecode(v))
          case Array(k) => (pctDecode(k), "")
        }
      }
      .filterNot { case (k, _) =>
        TrackingParams.contains(k) || k.startsWith("utm_") || k.startsWith("gaa_")
      }
      .sorted
    val query = pairs.map { case (k, v) => s"${pctEncode(k)}=${pctEncode(v)}" }
      .mkString("&")

    val sb = new StringBuilder
    sb.append(scheme).append("://").append(netloc).append(path)
    if (query.nonEmpty) sb.append("?").append(query)
    sb.toString
  }

  /** Port of `url_hash` (`src/url_utils.py:43-47`): sha256 hex of normalized. */
  def urlHashImpl(url: String): String = {
    val n = normalizeUrlImpl(url)
    if (n.isEmpty) ""
    else MessageDigest.getInstance("SHA-256")
      .digest(n.getBytes(StandardCharsets.UTF_8))
      .map(b => f"${b & 0xff}%02x").mkString
  }

  /** Port of `hostname` (`src/risk_rules.py:64-69`) — NB the reference does
    * `host.replace("www.", "")` (all occurrences), replicated faithfully. */
  def hostnameImpl(url: String): String = {
    try {
      val host = Option(new URI(Option(url).getOrElse("").trim).getHost)
        .getOrElse("").toLowerCase
      host.replace("www.", "")
    } catch { case _: Exception => "" }
  }

  val normalizeUrl = udf(normalizeUrlImpl _)
  val urlHash = udf(urlHashImpl _)
  val hostName = udf(hostnameImpl _)

  /** Column helper: normalized host + sha2 without the UDF, for simple URLs
    * (native, codegen-friendly fast path usable when inputs are known-clean). */
  def urlHashNative(url: Column): Column =
    org.apache.spark.sql.functions.sha2(normalizeUrl(url), 256)
}
