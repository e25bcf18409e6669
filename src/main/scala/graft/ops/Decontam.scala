package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination — flag corpus documents that share a word
  * n-gram with a held-out evaluation set (the GPT-3 appendix-C / Pile
  * procedure: any doc containing a benchmark 13-gram is quarantined).
  * Pure codegen'd column expressions; the benchmark side is DISTINCT'd and
  * broadcast (eval sets are ~1e5 docs — always the small side), so the
  * corpus pass is a narrow explode → broadcast hash join → per-doc count:
  * no corpus-keyed shuffle except the final per-doc groupBy, whose key is
  * never hotter than one document's grams.
  *
  * Tokens are ASCII `[A-Za-z0-9]+` runs lowercased (the TextOps/SegmentOps
  * convention — bit-identical between Java and RE2/utf8proc, so the DuckDB
  * oracle agrees); the join keys on md5 of the gram (d02 precedent: 16-byte
  * keys instead of arbitrary-length gram strings on the wire).
  */
object Decontam {

  /** Space-joined word n-grams of `text`; fewer than n tokens → empty. */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val toks = transform(
      regexp_extract_all(coalesce(text, lit("")), lit("[A-Za-z0-9]+"), lit(0)),
      x => lower(x))
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
  }

  /** (doc_id, n_hits, contaminated) per corpus doc: n_hits counts gram
    * OCCURRENCES that appear anywhere in `benchmark`; contaminated = 1 iff
    * any hit. */
  def flagOverlap(corpus: DataFrame, benchmark: DataFrame, n: Int,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    def gmd5(g: Column): Column = md5(to_binary(g, lit("utf-8")))
    val bench = broadcast(
      benchmark.select(explode(wordNgrams(col(textCol), n)).as("g"))
        .select(gmd5(col("g")).as("gmd5")).distinct())
    val hits = corpus
      .select(col(idCol).cast("long").as("doc_id"),
        explode(wordNgrams(col(textCol), n)).as("g"))
      .select(col("doc_id"), gmd5(col("g")).as("gmd5"))
      .join(bench, Seq("gmd5"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hits"))
    corpus.select(col(idCol).cast("long").as("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)) > 0).cast("int").as("contaminated"))
  }
}
