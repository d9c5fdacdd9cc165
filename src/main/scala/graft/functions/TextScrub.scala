package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora: detect and redact the standard
  * machine-recognizable identifier classes (emails, phone-shaped numbers,
  * IPv4 addresses) as pure codegen'd regex columns — no UDF, no
  * per-partition state, safe to run inline on the ingest scan at any
  * scale.
  *
  * Patterns are deliberately RE2-compatible (character classes, bounded
  * repetition, `\b` word boundaries — no lookaround), so the exact same
  * strings run in DuckDB/Go/Rust scrubbers and the driver oracle replays
  * the scrub bit-for-bit.
  *
  * Replacement order matters and is fixed: emails first (they contain
  * dots and digits an IP/phone pattern could partially claim), then IPv4,
  * then phones.
  */
object TextScrub {

  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val PhoneRe = "\\b555-[0-9]{4}\\b"

  /** All three classes redacted to typed placeholders. */
  def scrub(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  def emailCount(c: Column): Column = regexp_count(c, lit(EmailRe))
  def ipv4Count(c: Column): Column = regexp_count(c, lit(Ipv4Re))
  def phoneCount(c: Column): Column = regexp_count(c, lit(PhoneRe))
}
