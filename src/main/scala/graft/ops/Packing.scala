package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-sequence packing — the concatenate-and-chunk procedure used to
  * build fixed-length LM training batches: documents are concatenated in
  * `idCol` order and the token stream is chunked into `budget`-token
  * sequences; each document learns which sequence it starts in (`seq_id`),
  * at which offset (`seq_off`), and how many sequences it spans (`n_seqs`).
  *
  * The naive formulation is a global running sum —
  * `sum(n_tok) OVER (ORDER BY doc_id)` — whose unpartitioned ordering
  * funnels the entire corpus through ONE task. This implementation is the
  * distributed two-phase prefix sum instead:
  *
  *   1. range-sort the (id, n_tok) pairs (one exchange, balanced);
  *   2. job 1: per-partition token sums → collect (#partitions longs,
  *      bounded by cluster size, never by corpus size) → exclusive scan on
  *      the driver → broadcast;
  *   3. job 2: a narrow per-partition pass seeds its running sum from the
  *      broadcast offset and emits each doc's placement.
  *
  * Both jobs run over the SAME sorted RDD object, so Spark reuses the sort's
  * shuffle files for job 2 (the map stage is skipped) — no persist needed,
  * nothing to release. Token counts use the d01 whitespace convention
  * ([[TextOps.tokenCount]]) so the DuckDB oracle agrees bit-for-bit.
  */
object Packing {

  /** One row per doc: (doc_id, n_tok, seq_id, seq_off, n_seqs) under
    * concatenate-and-chunk packing at `budget` tokens per sequence.
    * Empty docs occupy no tokens: n_seqs = 0, seq_id/seq_off = where the
    * doc's text would have begun. Ids must be unique (they define packing
    * order) — duplicates fail fast rather than packing nondeterministically. */
  def packSequences(df: DataFrame, budget: Long,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    val spark = df.sparkSession
    import spark.implicits._
    // null text packs as 0 tokens (tokenCount's size(null) is null, which
    // would NPE the primitive tuple encoder); ids are required non-null
    val pairs = df.select(col(idCol).cast("long"),
      coalesce(TextOps.tokenCount(col(textCol)), lit(0)).cast("long"))
      .as[(Long, Long)]
    val sorted = pairs.rdd.sortBy(_._1)
    // job 1 also proves id uniqueness: after the sort, duplicates are
    // adjacent within a partition or straddle a boundary, so per-partition
    // (first, last, locally-strict) plus a driver boundary check is an exact
    // guard — duplicate ids would make packing order (and the oracle's
    // window order) nondeterministic, so fail fast instead of silently
    // diverging. The collect stays #partitions rows, never corpus-sized.
    val stats = sorted.mapPartitionsWithIndex { (i, it) =>
      var s = 0L; var n = 0L
      var first = 0L; var last = 0L; var strict = true
      it.foreach { case (id, t) =>
        s += t
        if (n == 0L) first = id
        else if (id <= last) strict = false
        last = id; n += 1
      }
      Iterator.single((i, s, n, first, last, strict))
    }.collect().sortBy(_._1)
    require(stats.forall(p => p._3 == 0L || p._6),
      s"$idCol values must be unique: duplicate id within a sorted partition")
    stats.filter(_._3 > 0L).sliding(2).foreach {
      case Array(a, b) => require(a._5 < b._4,
        s"$idCol values must be unique: duplicate id ${b._4} at a partition boundary")
      case _ => ()
    }
    val starts = spark.sparkContext.broadcast(
      stats.map(_._2).scanLeft(0L)(_ + _))
    val b = budget
    val out = sorted.mapPartitionsWithIndex { (i, it) =>
      var cum = starts.value(i)
      it.map { case (id, n) =>
        val start = cum
        cum += n
        val nSeqs = if (n == 0L) 0L else (start + n - 1) / b - start / b + 1
        (id, n, start / b, start % b, nSeqs)
      }
    }
    spark.createDataFrame(out)
      .toDF("doc_id", "n_tok", "seq_id", "seq_off", "n_seqs")
  }
}
