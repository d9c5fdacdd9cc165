package graft

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.functions.{RiskRules, TextLookup, UrlFunctions}
import org.scalatest.funsuite.AnyFunSuite

/** Differential parity vs the REFERENCE's own pure-Python kernels on an
  * adversarial URL/text battery: goldens in
  * src/test/resources/goldens/url_text_parity.json were produced by running
  * the unmodified reference code (src/url_utils.py, src/risk_rules.py) and
  * CPython difflib via tools/gen_url_goldens.py. Inputs cover the messy
  * real-world shapes java.net.URI mishandles — unencoded spaces, underscore
  * hosts, bare IDNs, scheme-less strings, `;params`, UTF-8 and malformed
  * percent-escapes — which is exactly where label parity used to diverge. */
class UrlParitySpec extends AnyFunSuite {

  private val root: JsonNode = {
    val mapper = new ObjectMapper()
    val in = getClass.getResourceAsStream("/goldens/url_text_parity.json")
    try mapper.readTree(in) finally in.close()
  }

  private def rows(section: String): Seq[JsonNode] =
    root.get(section).elements().asScala.toSeq

  private def s(n: JsonNode, f: String): String =
    if (n.get(f) == null || n.get(f).isNull) null else n.get(f).asText()

  test("normalize_url parity (38 adversarial URLs)") {
    rows("normalize_url").foreach { r =>
      val in = s(r, "in")
      val want = if (r.get("err").asBoolean()) "" else s(r, "out")
      assert(UrlFunctions.normalizeUrlImpl(in) == want, s"normalize_url(${in})")
    }
  }

  test("url_hash parity") {
    rows("url_hash").foreach { r =>
      val in = s(r, "in")
      val want = if (r.get("err").asBoolean()) "" else s(r, "out")
      assert(UrlFunctions.urlHashImpl(in) == want, s"url_hash(${in})")
    }
  }

  test("hostname parity") {
    rows("hostname").foreach { r =>
      assert(UrlFunctions.hostnameImpl(s(r, "in")) == s(r, "out"),
        s"hostname(${s(r, "in")})")
    }
  }

  test("classify_control parity") {
    rows("classify_control").foreach { r =>
      val domains = r.get("domains").elements().asScala.map(_.asText()).toSet
      val got = RiskRules.classifyControl(
        s(r, "company"), s(r, "url"), domains,
        entityType = Option(s(r, "entity_type")).getOrElse("company"),
        personName = s(r, "person"), publisher = s(r, "publisher"))
      assert(got == r.get("out").asBoolean(),
        s"classify_control(${s(r, "company")}, ${s(r, "url")})")
    }
  }

  test("is_financial_routine parity") {
    rows("is_financial_routine").foreach { r =>
      val got = RiskRules.isFinancialRoutine(
        s(r, "title"), s(r, "snippet"), s(r, "url"), s(r, "source"))
      assert(got == r.get("out").asBoolean(), s"is_financial_routine(${s(r, "title")})")
    }
  }

  test("SequenceMatcher.ratio parity incl. autojunk boundary") {
    rows("sequence_matcher_ratio").foreach { r =>
      val got = TextLookup.sequenceMatcherRatio(s(r, "a"), s(r, "b"))
      assert(got == r.get("out").asDouble(),
        s"ratio(${s(r, "a").take(40)}..., ${s(r, "b").take(40)}...)")
    }
  }
}
