package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Segment-level dedup + repetition operators — the intra-document half of a
  * training-data pipeline: C4-style cross-corpus line dedup (Raffel et al.
  * 2020 §2.2 dedup "three-sentence spans"; CCNet dedups paragraphs) and
  * Gopher-style repetition signals (Rae et al. 2021, table A1: duplicate
  * line/paragraph fraction, top n-gram fraction). All are parameterized by
  * the segment delimiter so one operator covers line ('\n'), paragraph
  * ("\n\n"), sentence, or word granularity.
  *
  * Everything is Catalyst column expressions (codegen'd, no UDFs), and every
  * output column is integer/string-exact so the DuckDB oracle compare is
  * stable. Shuffle shapes at 10^12 docs:
  *
  *   - segmentDedup: explode → groupBy(md5(segment)) with map-side partial
  *     agg (a boilerplate line duplicated 10^9 times collapses to one row
  *     per map partition before the exchange), winner joined back on the
  *     32-char md5 key (AQE skew-join splittable — the winner side is one
  *     row per key), rebuild groupBy(doc_id) whose state is bounded by a
  *     single document's own size. No window over the corpus anywhere
  *     (the corpus-wide `row_number() over (partition by segment)`
  *     formulation — what the DuckDB oracle uses — would put every copy of
  *     a hot segment into ONE reducer with no partial-agg relief).
  *   - repetitionSignals: two groupBys, both partial-agg friendly; the
  *     (doc_id, segment) key is never hotter than one document.
  *   - topBigram: narrow token/bigram expression, then the same per-doc
  *     groupBy pair.
  */
object SegmentOps {

  private def quoted(delim: String): String = java.util.regex.Pattern.quote(delim)

  /** Split into segments, KEEPING trailing empties (Java split limit -1),
    * matching DuckDB `string_split` exactly: "a,b,," → 4 segments. */
  private def segsOf(text: Column, delim: String): Column =
    split(coalesce(text, lit("")), quoted(delim), -1)

  /** C4-style cross-document segment dedup: among all segments of at least
    * `minChars` chars, only the FIRST occurrence in (doc_id, seg_idx) order
    * survives corpus-wide; shorter segments (blank lines, separators, "a")
    * always survive. Documents are rebuilt from their surviving segments in
    * original order. Output: (doc_id, n_segments, n_kept, kept_text).
    *
    * The groupBy keys on md5 of the segment (d02 `exact` precedent) so the
    * exchange carries 32-byte keys instead of arbitrary-length lines. */
  def segmentDedup(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", delim: String = "\n",
      minChars: Int = 1): DataFrame = {
    val base = df.select(col(idCol).cast("long").as("doc_id"),
      segsOf(col(textCol), delim).as("segs"))
    val segs = base.select(col("doc_id"),
      posexplode(col("segs")).as(Seq("seg_idx", "seg")))
    val cand = segs.filter(length(col("seg")) >= minChars)
      .withColumn("seg_md5", TextOps.md5Key(col("seg")))
    // winner per distinct segment = lexicographic min of (doc_id, seg_idx):
    // partial-aggregated min, so hot segments never concentrate pre-agg rows
    val winners = cand.groupBy(col("seg_md5"))
      .agg(min(struct(col("doc_id"), col("seg_idx"))).as("w"))
    val keptCand = cand.join(winners, Seq("seg_md5"))
      .filter(col("doc_id") === col("w.doc_id") &&
        col("seg_idx") === col("w.seg_idx"))
      .select(col("doc_id"), col("seg_idx"), col("seg"))
    val kept = keptCand.unionByName(
      segs.filter(length(col("seg")) < minChars))
    // per-doc rebuild: collect_list is bounded by one document's segments
    val rebuilt = kept.groupBy(col("doc_id")).agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(array_sort(collect_list(struct(col("seg_idx"), col("seg")))),
          x => x.getField("seg")),
        delim).as("kept_text"))
    base.select(col("doc_id"), size(col("segs")).cast("long").as("n_segments"))
      .join(rebuilt, Seq("doc_id"), "left") // a doc can lose ALL its segments
      .select(col("doc_id"), col("n_segments"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }

  /** Gopher-style intra-document repetition signals: occurrences beyond the
    * first of any repeated segment, and the characters they carry. Integer
    * counts (ratios derive downstream where float drift doesn't matter).
    * Output: (doc_id, n_segments, n_dup_segments, n_dup_chars). */
  def repetitionSignals(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id", delim: String = "\n"): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
        explode(segsOf(col(textCol), delim)).as("seg"))
      .groupBy(col("doc_id"), col("seg")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(
        sum(col("c")).as("n_segments"),
        sum(col("c") - 1).as("n_dup_segments"),
        sum((col("c") - 1) * length(col("seg"))).as("n_dup_chars"))

  /** Top word-bigram repetition (the Gopher "top 2-gram fraction" numerator/
    * denominator, integer-exact): tokens are ASCII `[A-Za-z0-9]+` runs
    * lowercased — ASCII-only tokens make `lower` bit-identical between Java
    * and the oracle's RE2/utf8proc, so no locale/Unicode-case drift.
    * Output: (doc_id, n_bigrams, n_top_bigram); docs with < 2 tokens report
    * (0, 0). */
  def topBigram(df: DataFrame, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    val toks = df.select(col(idCol).cast("long").as("doc_id"),
      TextOps.asciiTokens(col(textCol)).as("t"))
    // guard: slice with length size-1 is invalid below 2 tokens, and
    // sequence(1, 0) would be a DECREASING sequence, so gate explicitly
    val bigrams = when(size(col("t")) < 2, array().cast("array<string>"))
      .otherwise(zip_with(
        slice(col("t"), lit(1), size(col("t")) - 1),
        slice(col("t"), lit(2), size(col("t")) - 1),
        (a, b) => concat(a, lit(" "), b)))
    val perBigram = toks.select(col("doc_id"), explode(bigrams).as("b"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id")).agg(
        sum(col("c")).as("n_bigrams"),
        max(col("c")).as("n_top_bigram"))
    toks.select(col("doc_id")) // <2-token docs emit no bigram rows
      .join(perBigram, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_top_bigram"), lit(0L)).as("n_top_bigram"))
  }
}
