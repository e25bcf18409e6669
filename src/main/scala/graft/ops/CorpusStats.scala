package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus profiling operators — the inspection passes every curation
  * pipeline runs before and after its filters (vocabulary audits for
  * tokenizer training, length distributions for packing/budget planning).
  * Both are exact, fully SQL-expressible, and engine-agnostic, so each
  * carries a full-hash DuckDB oracle (d43/d44).
  */
object CorpusStats {

  /** Top-k corpus vocabulary: the k most frequent normalized tokens (the
    * shared [[TextOps.asciiTokens]] stream), with occurrence and document
    * frequencies.
    *
    * Plan shape at 10^12 rows: one narrow tokenize+explode into a
    * token-keyed aggregate — map-side partial agg collapses each partition
    * to its distinct-token count, so the exchange carries vocabulary-sized
    * data, not corpus-sized (natural-language vocabularies saturate in the
    * millions while token occurrences grow without bound). Document
    * frequency rides the same aggregate as count(DISTINCT doc_id), and the
    * trailing orderBy+limit compiles to TakeOrderedAndProject — bounded
    * per-partition top-k, exactly k rows cross to the driver, no global
    * sort. The (n_occurrences DESC, token) ordering is total, so the k-th
    * boundary is deterministic on any engine or partitioning. */
  def topTokens(docs: DataFrame, k: Int = 200,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    docs.select(col(idCol).cast("long").as("doc_id"),
        explode(TextOps.asciiTokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("doc_id")).as("n_docs"))
      .orderBy(col("n_occurrences").desc, col("token"))
      .limit(k)
  }

  /** Token-length histogram: documents bucketed by floor(log2(n_tokens))
    * (bucket −1 holds empty docs), with per-bucket doc and token totals —
    * the length profile packing/budget planning reads.
    *
    * Narrow token-count scan (native, no token array) into a ≤ ~64-row
    * aggregate: the exchange carries one row per bucket per partition.
    * Buckets are integer-exact (floor of log2 on a BIGINT via bit length,
    * no floating point), so any engine reproduces them bit-for-bit. */
  def lengthHistogram(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val n = TextOps.asciiTokenCount(col(textCol)).cast("long")
    // floor(log2(n)) for n >= 1 computed integrally: 63 - leading zeros.
    // Spark has no BIGINT clz, but log2 via bit tests is overkill here —
    // n is a per-doc token count < 2^31; a 31-step CASE would be exact but
    // noisy. Instead: length of the binary string minus 1 — exact for any
    // positive BIGINT, and DuckDB reproduces it with the same expression.
    val bucket = when(n <= 0, lit(-1))
      .otherwise((length(bin(n)) - 1).cast("int"))
    docs.select(bucket.as("log2_tokens"), n.as("__n"))
      .groupBy(col("log2_tokens"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("n_tokens"))
  }
}
