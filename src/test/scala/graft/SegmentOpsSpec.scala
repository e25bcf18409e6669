package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.ops.SegmentOps

/** Planted-truth vectors for the segment-level dedup/repetition family
  * (C4 line dedup, Gopher repetition signals, top-bigram) — the newline
  * granularity the synthetic driver corpus can't exercise (it is single-line
  * word soup; the driver queries run the same operators at word granularity
  * against the DuckDB oracle). */
class SegmentOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-segment-ops-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def dedupMap(rows: Seq[(Long, String)], minChars: Int = 2) = {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    SegmentOps.segmentDedup(rows.toDF("doc_id", "text"), minChars = minChars)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_segments"), r.getAs[Long]("n_kept"),
          r.getAs[String]("kept_text"))))
      .toMap
  }

  test("segmentDedup keeps only the first corpus-wide occurrence of a line") {
    val m = dedupMap(Seq(
      0L -> "alpha\nbravo\nalpha\ncc",
      1L -> "bravo\ndelta\n\nbravo",
      2L -> ""))
    // doc 0: alpha(win) bravo(win) alpha(lost to 0,0) cc(win) -> 3 kept
    assert(m(0L) == ((4L, 3L, "alpha\nbravo\ncc")))
    // doc 1: bravo lost to doc 0; delta wins; "" is short -> always kept;
    // final bravo lost
    assert(m(1L) == ((4L, 2L, "delta\n")))
    // empty text splits to one empty segment, short -> kept verbatim
    assert(m(2L) == ((1L, 1L, "")))
  }

  test("segmentDedup winner is the lexicographic (doc_id, seg_idx) minimum") {
    // same line first appears at doc 5 idx 0, then doc 9 idx 2: doc 5 wins
    val m = dedupMap(Seq(5L -> "xx\nyy", 9L -> "zz\nqq\nxx"))
    assert(m(5L) == ((2L, 2L, "xx\nyy")))
    assert(m(9L) == ((3L, 2L, "zz\nqq")))
  }

  test("segmentDedup: a doc whose every segment loses rebuilds to empty") {
    val m = dedupMap(Seq(0L -> "solo", 1L -> "solo"))
    assert(m(0L) == ((1L, 1L, "solo")))
    assert(m(1L) == ((1L, 0L, "")))
  }

  test("segmentDedup minChars gate exempts short segments from dedup") {
    // "ab" appears twice across docs but is below minChars=3: both survive
    val m = dedupMap(Seq(0L -> "ab\nlongline", 1L -> "ab\nlongline"), minChars = 3)
    assert(m(0L) == ((2L, 2L, "ab\nlongline")))
    assert(m(1L) == ((2L, 1L, "ab")))
  }

  test("repetitionSignals counts occurrences beyond the first, and their chars") {
    import spark.implicits._
    val df = Seq(
      (0L, "dup\nuniq\ndup\ndup\nother"), // dup x3 -> 2 beyond first, 6 chars
      (1L, "a\nb\nc"),                     // no repetition
      (2L, "\n\n")                         // 3 empty segments: 2 dups, 0 chars
    ).toDF("doc_id", "text")
    val m = SegmentOps.repetitionSignals(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_segments"), r.getAs[Long]("n_dup_segments"),
          r.getAs[Long]("n_dup_chars")))).toMap
    assert(m(0L) == ((5L, 2L, 6L)))
    assert(m(1L) == ((3L, 0L, 0L)))
    assert(m(2L) == ((3L, 2L, 0L)))
  }

  test("topBigram counts total and most-repeated word bigram") {
    import spark.implicits._
    val df = Seq(
      (0L, "a b a b c"),    // bigrams: "a b","b a","a b","b c" -> 4 total, top 2
      (1L, "Hello, WORLD. hello world"), // case-folded: "hello world" x2 + 1
      (2L, "single"),        // <2 tokens -> (0, 0)
      (3L, "")               // no tokens -> (0, 0)
    ).toDF("doc_id", "text")
    val m = SegmentOps.topBigram(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Long]("n_top_bigram")))).toMap
    assert(m(0L) == ((4L, 2L)))
    assert(m(1L) == ((3L, 2L)))
    assert(m(2L) == ((0L, 0L)))
    assert(m(3L) == ((0L, 0L)))
  }

  test("word-granularity dedup (the driver query shape) on a planted corpus") {
    import spark.implicits._
    val df = Seq(
      (0L, "the quick fox the end"),
      (1L, "quick brown fox")
    ).toDF("doc_id", "text")
    val m = SegmentOps.segmentDedup(df, delim = " ", minChars = 3).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_segments"), r.getAs[Long]("n_kept"),
          r.getAs[String]("kept_text")))).toMap
    // doc 0: the(win) quick(win) fox(win) the(lost to 0,0) end(win)
    assert(m(0L) == ((5L, 4L, "the quick fox end")))
    // doc 1: quick+fox lost to doc 0; brown wins
    assert(m(1L) == ((3L, 1L, "brown")))
  }
}
