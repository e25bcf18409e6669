package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.ops.Pii

/** Planted-truth vectors for PII scrubbing. The expected strings below were
  * cross-checked against DuckDB's RE2 `regexp_replace(..., 'g')` on the same
  * patterns, so this spec locks the Java-regex side of the engine parity the
  * driver oracle asserts end-to-end. */
class PiiSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .appName("graft-pii-spec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(rows: Seq[(Long, String)]) = {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    Pii.scrub(rows.toDF("doc_id", "text"), col("text")).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Int]("n_emails"), r.getAs[Int]("n_ipv4"),
          r.getAs[Int]("n_phones"), r.getAs[String]("scrubbed")))).toMap
  }

  test("emails, IPs, and phones are counted and redacted") {
    val m = run(Seq(
      0L -> "contact user.name+tag@sub.example.co.uk here",
      1L -> "ip 10.0.0.255 and 999.1.2.3 edge",
      2L -> "call +14155550123 or +442071838750 now",
      3L -> "no pii at all"))
    assert(m(0L) == ((1, 0, 0, "contact [EMAIL] here")))
    // octets are NOT range-checked: 999.1.2.3 redacts (over-redaction is
    // the safe failure mode)
    assert(m(1L) == ((0, 2, 0, "ip [IP] and [IP] edge")))
    assert(m(2L) == ((0, 0, 2, "call [PHONE] or [PHONE] now")))
    assert(m(3L) == ((0, 0, 0, "no pii at all")))
  }

  test("category overlap: counts see raw text, redaction is sequential") {
    // the email's host CONTAINS a dotted quad: email count 1, ipv4 count 1
    // (both on raw text), but the email pass consumes it first so one
    // [EMAIL] remains
    val m = run(Seq(0L -> "x root@1.2.3.4.com y"))
    assert(m(0L) == ((1, 1, 0, "x [EMAIL] y")))
    // a bare dotted-quad host is NOT an email (the pattern demands a letter
    // TLD): only the IPv4 pass fires, leaving the user@ prefix
    val m2 = run(Seq(0L -> "x root@1.2.3.4 y"))
    assert(m2(0L) == ((0, 1, 0, "x root@[IP] y")))
  }

  test("boundary honesty: version-like dotted tokens inside words survive") {
    // \b around the dotted quad: digits glued to letters don't redact
    val m = run(Seq(0L -> "pkg v1.2.3.4x stays, +123 too short stays"))
    assert(m(0L)._4 == "pkg v1.2.3.4x stays, +123 too short stays")
  }

  test("multiple categories in one document") {
    val m = run(Seq(0L -> "a@b.co 1.2.3.4 +1234567 end"))
    assert(m(0L) == ((1, 1, 1, "[EMAIL] [IP] [PHONE] end")))
  }
}
