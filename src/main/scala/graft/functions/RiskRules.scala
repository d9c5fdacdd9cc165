package graft.functions

import java.util.regex.Pattern

/** Control / finance-routine classification kernels (reference K11/K12:
  * `src/risk_rules.py:27-381`). All pure string/URL logic — ported with the
  * reference's exact pattern sets and decision order; cited per function.
  * Used on the ingest path (classify once, persist), so UDF codegen fencing
  * is acceptable; hot read paths consume the stored labels.
  */
object RiskRules {

  private def ci(p: String) = Pattern.compile(p, Pattern.CASE_INSENSITIVE)

  // --- pattern sets (`src/risk_rules.py:4-62`) ---
  val AlwaysControlledDomains: Set[String] =
    Set("facebook.com", "instagram.com", "play.google.com", "apps.apple.com")
  val CeoUncontrolledDomains: Set[String] =
    Set("wikipedia.org", "youtube.com", "youtu.be", "tiktok.com")
  val CeoControlledPathKeywords: Set[String] = Set(
    "/leadership/", "/about/", "/governance/", "/team/", "/investors/",
    "/board-of-directors", "/members/", "/member/")

  val FinanceTermsRe: Pattern = ci(Seq(
    "\\bearnings\\b", "\\beps\\b", "\\brevenue\\b", "\\bguidance\\b", "\\bforecast\\b",
    "\\bprice target\\b", "\\bupgrade\\b", "\\bdowngrade\\b", "\\bdividend\\b",
    "\\bbuyback\\b", "\\bshares?\\b", "\\bstock\\b", "\\bmarket cap\\b",
    "\\bquarterly\\b", "\\bfiscal\\b", "\\bprofit\\b", "\\bEBITDA\\b",
    "\\b10-q\\b", "\\b10-k\\b", "\\bsec\\b", "\\bipo\\b").mkString("|"))

  val FinanceSources: Set[String] = Set(
    "yahoo.com", "marketwatch.com", "fool.com", "benzinga.com",
    "seekingalpha.com", "thefly.com", "barrons.com", "wsj.com",
    "investorplace.com", "nasdaq.com", "foolcdn.com",
    "primaryignition.com", "tradingview.com", "marketscreener.com",
    "gurufocus.com")

  val TickerRe: Pattern = Pattern.compile("\\b(?:NYSE|NASDAQ|AMEX):\\s?[A-Z]{1,5}\\b")

  val MaterialRiskTermsRe: Pattern = ci(Seq(
    "\\blawsuits?\\b", "\\blegal action\\b", "\\bclass action\\b", "\\bsu(?:e|es|ed|ing)\\b",
    "\\bsettle(?:ment|d|s)?\\b", "\\bprobe\\b", "\\binvestigat(?:e|es|ed|ion|ions)\\b",
    "\\bsubpoena(?:s)?\\b", "\\bsec (?:probe|investigation|charge|charges)\\b", "\\bdoj\\b",
    "\\bcharge(?:d|s)?\\b", "\\bindict(?:ed|ment)?\\b", "\\bfraud\\b", "\\bscandal\\b",
    "\\bbankrupt(?:cy|cies)?\\b", "\\blayoffs?\\b", "\\brecall(?:s|ed)?\\b",
    "\\bdata breach(?:es)?\\b", "\\bcyber(?:attack|attacks|breach|breaches)\\b",
    "\\bwhistleblower(?:s)?\\b", "\\bmisconduct\\b", "\\bboycott(?:s|ed)?\\b").mkString("|"))

  val NameIgnoreTokens: Set[String] = Set(
    "inc", "incorporated", "corporation", "corp", "company", "co",
    "llc", "ltd", "limited", "plc", "group", "holdings", "holding",
    "the", "and", "of", "services")
  val PublisherSuffixTokens: Set[String] =
    Set("news", "newsroom", "media", "press", "wire", "blog", "official")

  // --- token helpers (`src/risk_rules.py:72-137`) ---
  def normToken(s: String): String =
    Option(s).getOrElse("").toLowerCase(java.util.Locale.ROOT).filter(_.isLetterOrDigit)

  private def nameTokens(value: String, minLen: Int = 4): List[String] =
    Option(value).getOrElse("").split("[\\W_]+").toList
      .map(normToken)
      .filter(t => t.nonEmpty && !NameIgnoreTokens.contains(t) && t.length >= minLen)

  def publisherMatchesCompany(company: String, publisher: String): Boolean = {
    if (company == null || company.isEmpty || publisher == null || publisher.isEmpty)
      return false
    val brandToken = normToken(company)
    val publisherToken = normToken(publisher)
    if (brandToken.nonEmpty && brandToken == publisherToken) return true
    val companyTokens = nameTokens(company)
    val publisherTokens = nameTokens(publisher, minLen = 3).toSet
    if (companyTokens.length >= 2 && companyTokens.toSet.subsetOf(publisherTokens))
      return true
    if (companyTokens.length == 1 && brandToken.nonEmpty) {
      if (publisherToken == brandToken) return true
      if (publisherToken.startsWith(brandToken)) {
        val suffix = publisherToken.substring(brandToken.length)
        if (suffix.nonEmpty && PublisherSuffixTokens.contains(suffix)) return true
      }
    }
    false
  }

  private def companyHandleTokens(company: String): Set[String] = {
    val words = Option(company).getOrElse("").split("\\W+").filter(_.nonEmpty)
    val tokens = scala.collection.mutable.Set.empty[String]
    val full = normToken(company)
    if (full.nonEmpty) tokens += full
    if (words.length >= 2) tokens += normToken(words.take(2).mkString)
    else if (words.nonEmpty) tokens += normToken(words(0))
    tokens.filter(_.length >= 4).toSet
  }

  private def personHandleTokens(name: String): Set[String] = {
    val words = Option(name).getOrElse("").split("\\W+").filter(_.nonEmpty)
    val tokens = scala.collection.mutable.Set.empty[String]
    val full = normToken(name)
    if (full.nonEmpty) tokens += full
    if (words.length >= 2) {
      tokens += normToken(words.take(2).mkString)
      tokens += normToken(words.takeRight(2).mkString)
    }
    if (words.nonEmpty) {
      tokens += normToken(words.head)
      tokens += normToken(words.last)
    }
    tokens.filter(_.length >= 3).toSet
  }

  /** (hostname www-stripped, RAW-case path) via [[PyUrl]] — the reference's
    * helper predicates (`src/risk_rules.py:140-235`) keep the path's case, so
    * `user/`/`company/`/`in/` prefix checks are case-sensitive; only
    * `classify_control` itself lowercases its path copy. */
  private def hostAndPath(url: String): (String, String) = {
    try {
      val p = PyUrl.urlparse(Option(url).getOrElse(""))
      (p.hostname.replace("www.", ""), p.path)
    } catch { case _: Exception => ("", "") }
  }

  // python str.strip("/"): ALL leading/trailing slashes
  private def stripSlashes(p: String): String = p.replaceAll("^/+|/+$", "")

  private def isBrandYoutubeChannel(company: String, host: String, rawPath: String): Boolean = {
    if (!(host == "youtube.com" || host == "m.youtube.com")) return false
    val brandToken = normToken(company)
    if (brandToken.isEmpty) return false
    val path = stripSlashes(rawPath)
    if (path.isEmpty) return false
    // prefix check is case-insensitive (`path.lower().startswith("user/")`,
    // risk_rules.py:153) but the slug keeps raw case (normToken lowers it)
    val slug =
      if (path.toLowerCase(java.util.Locale.ROOT).startsWith("user/")) path.substring(5)
      else if (path.startsWith("@")) path.substring(1)
      else path.split("/", 2)(0)
    val slugToken = normToken(slug)
    slugToken.nonEmpty && slugToken.contains(brandToken)
  }

  private def linkedinSlugMatchesCompany(company: String, slug: String): Boolean = {
    if (company == null || company.isEmpty || slug == null || slug.isEmpty) return false
    val companyTokens = company.toLowerCase(java.util.Locale.ROOT).split("\\W+").toList.map(normToken)
      .filter(t => t.nonEmpty && !NameIgnoreTokens.contains(t) && t.length >= 4)
    val slugTokens = slug.toLowerCase(java.util.Locale.ROOT).split("[\\W_]+").toList.map(normToken)
      .filter(t => t.nonEmpty && t.length >= 3)
    if (companyTokens.isEmpty || slugTokens.isEmpty) return false
    companyTokens.exists(ct => slugTokens.exists(st => st.contains(ct) || ct.contains(st)))
  }

  private def isLinkedinCompanyPage(company: String, host: String, rawPath: String): Boolean = {
    if (host != "linkedin.com") return false
    val path = stripSlashes(rawPath)
    if (!path.toLowerCase(java.util.Locale.ROOT).startsWith("company/")) return false
    val rest = if (path.contains("/")) path.split("/", 2)(1) else ""
    val slug = if (rest.nonEmpty) rest.split("/", 2)(0) else ""
    if (slug.isEmpty) return false
    val brandToken = normToken(company)
    val slugToken = normToken(slug)
    if (brandToken.nonEmpty && slugToken.contains(brandToken)) return true
    linkedinSlugMatchesCompany(company, slug)
  }

  private def isLinkedinPersonProfile(name: String, host: String, rawPath: String): Boolean = {
    if (host != "linkedin.com") return false
    val path = stripSlashes(rawPath)
    if (!(path.toLowerCase(java.util.Locale.ROOT).startsWith("in/") || path.toLowerCase(java.util.Locale.ROOT).startsWith("pub/")))
      return false
    val rest = if (path.contains("/")) path.split("/", 2)(1) else ""
    val slug = if (rest.nonEmpty) rest.split("/", 2)(0) else ""
    if (slug.isEmpty) return false
    val slugToken = normToken(slug)
    if (slugToken.isEmpty) return false
    personHandleTokens(name).exists(t => t.nonEmpty && slugToken.contains(t))
  }

  private def xHandleMatches(tokens: Set[String], host: String, rawPath: String): Boolean = {
    if (!(host == "x.com" || host == "twitter.com")) return false
    val path = stripSlashes(rawPath)
    val handle = if (path.nonEmpty) path.split("/", 2)(0) else ""
    if (handle.isEmpty) return false
    val handleToken = normToken(handle)
    handleToken.nonEmpty && tokens.exists(t => t.nonEmpty && handleToken.contains(t))
  }

  /** `parse_company_domains` (`src/risk_rules.py:268-281`): `|`-split website
    * list -> normalized host set. */
  def parseCompanyDomains(websites: String): Set[String] =
    Option(websites).getOrElse("").split("\\|").toSet[String]
      .map(_.trim).filter(_.nonEmpty)
      .map(u => if (u.startsWith("http://") || u.startsWith("https://")) u else s"http://$u")
      .map(UrlFunctions.hostnameImpl)
      .filter(h => h.nonEmpty && h.contains("."))

  /** K11 `classify_control` (`src/risk_rules.py:284-346`): true = the entity
    * controls this surface (own site/profile), false = earned/uncontrolled. */
  def classifyControl(
      company: String,
      url: String,
      companyDomains: Set[String],
      entityType: String = "company",
      personName: String = null,
      publisher: String = null): Boolean = {
    if (publisherMatchesCompany(company, Option(publisher).getOrElse(""))) return true
    // URL parsed ONCE; every helper predicate below receives (host, rawPath).
    // The reference re-parses per helper (risk_rules.py) — semantics are
    // unchanged by sharing the parse, and the classify UDF drops from ~7
    // PyUrl parses per row to 1.
    val (host, rawPath) = hostAndPath(url)
    if (host.isEmpty) return false
    val path = rawPath.toLowerCase(java.util.Locale.ROOT)
    if (entityType == "ceo") {
      if (CeoUncontrolledDomains.exists(bad => host == bad || host.endsWith("." + bad)))
        return false
      if (personName != null && isLinkedinPersonProfile(personName, host, rawPath)) return true
      if (personName != null && xHandleMatches(personHandleTokens(personName), host, rawPath))
        return true
    }
    if (host == "facebook.com")
      return !Seq("/posts/", "/photos/", "/videos/").exists(path.contains)
    if (host == "instagram.com")
      return !Seq("/p/", "/reels/").exists(path.contains)
    if (host == "threads.net")
      return !path.contains("/posts/")
    if (isBrandYoutubeChannel(company, host, rawPath)) return true
    if (isLinkedinCompanyPage(company, host, rawPath)) return true
    if (path.contains("/status/") && (host == "x.com" || host == "twitter.com"))
      return false
    if (xHandleMatches(companyHandleTokens(company), host, rawPath)) return true
    if (AlwaysControlledDomains.exists(good => host == good || host.endsWith("." + good)))
      return true
    val matchedCompanyDomain =
      companyDomains.exists(rd => host == rd || host.endsWith("." + rd))
    if (matchedCompanyDomain) return true
    val brandToken = normToken(company)
    val parts = host.split("\\.").filter(_.nonEmpty).map(normToken)
    if (brandToken.nonEmpty && parts.dropRight(1).contains(brandToken)) return true
    if (entityType == "ceo" && CeoControlledPathKeywords.exists(path.contains))
      return matchedCompanyDomain ||
        (brandToken.nonEmpty && parts.dropRight(1).contains(brandToken))
    false
  }

  /** K12 `is_financial_routine` (`src/risk_rules.py:349-359`). */
  def isFinancialRoutine(title: String, snippet: String = "", url: String = "",
      source: String = ""): Boolean = {
    val hay = s"${Option(title).getOrElse("")} ${Option(snippet).getOrElse("")} ${Option(source).getOrElse("")}".trim
    if (FinanceTermsRe.matcher(hay).find()) return true
    if (TickerRe.matcher(Option(title).getOrElse("")).find()) return true
    val host = UrlFunctions.hostnameImpl(url)
    host.nonEmpty && FinanceSources.exists(d => host == d || host.endsWith("." + d))
  }

  def hasMaterialRiskTerms(title: String, snippet: String = "", source: String = ""): Boolean = {
    val hay = s"${Option(title).getOrElse("")} ${Option(snippet).getOrElse("")} ${Option(source).getOrElse("")}".trim
    MaterialRiskTermsRe.matcher(hay).find()
  }

  /** K12 `should_neutralize_finance_routine` (`src/risk_rules.py:361-381`):
    * routine finance stories get pos/neg sentiment neutralized unless
    * material-risk terms appear. */
  def shouldNeutralizeFinanceRoutine(
      sentiment: String,
      title: String,
      snippet: String = "",
      url: String = "",
      source: String = "",
      financeRoutine: java.lang.Boolean = null): Boolean = {
    if (sentiment != "positive" && sentiment != "negative") return false
    val isRoutine =
      if (financeRoutine != null) financeRoutine.booleanValue()
      else isFinancialRoutine(title, snippet, url, source)
    if (!isRoutine) return false
    !hasMaterialRiskTerms(title, snippet, source)
  }
}
