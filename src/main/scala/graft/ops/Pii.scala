package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PII scrubbing — the redaction stage of a training-data pipeline
  * (RefinedWeb §2.4 / Dolma-style: emails, IP addresses, phone numbers →
  * placeholder tokens). Pure codegen'd regexp expressions, narrow (no
  * shuffle), and every pattern is restricted to constructs whose semantics
  * agree between Java regex and RE2 so the DuckDB oracle is bit-identical
  * (the TextOps.BpeTokenPattern precedent).
  *
  * Counts are computed per category on the RAW text; redaction applies the
  * three replacements sequentially in a fixed order (email, then IPv4, then
  * phone), so a string matching two categories (an email whose domain is a
  * dotted quad) is counted by both but redacted by the first pass — the
  * order is part of the operator contract, identical in both engines.
  */
object Pii {

  /** user@host.tld with the usual atom chars; TLD is 2+ letters. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted quad, word-bounded. Deliberately does NOT range-check octets
    * (999.1.2.3 redacts) — over-redaction is the safe failure mode. */
  val Ipv4Pattern = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** E.164-style international numbers: + then 7-15 digits. Local formats
    * (dashes/spaces/parens) are intentionally out of scope — their regexes
    * false-positive on dates/ids far more than they catch real numbers. */
  val PhonePattern = "\\+\\d{7,15}"

  def scrubbed(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "[EMAIL]"),
        Ipv4Pattern, "[IP]"),
      PhonePattern, "[PHONE]")

  /** (doc_id, n_emails, n_ipv4, n_phones, scrubbed) over `text`. */
  def scrub(df: DataFrame, text: Column, idCol: String = "doc_id"): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      coalesce(regexp_count(text, lit(EmailPattern)), lit(0)).as("n_emails"),
      coalesce(regexp_count(text, lit(Ipv4Pattern)), lit(0)).as("n_ipv4"),
      coalesce(regexp_count(text, lit(PhonePattern)), lit(0)).as("n_phones"),
      scrubbed(text).as("scrubbed"))
}
