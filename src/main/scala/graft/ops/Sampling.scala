package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-curation sampling operators: per-domain quotas (cap hot hosts —
  * the CCNet/RefinedWeb-style "at most K documents per domain" gate) and
  * deterministic content-hash splits (stable train/held-out selection that
  * survives reruns and repartitioning). Both avoid the naive corpus-wide
  * `row_number() over (partition by key)` formulation, which at 10^12 rows
  * funnels every row of a hot key through one reducer.
  */
object Sampling {

  /** Keep the K smallest `idCol` rows per `keyCol` (deterministic per-domain
    * quota). Two-phase exact top-k:
    *
    *   1. narrow mapPartitions: per-partition bounded max-heaps keep the K
    *      smallest ids per key, emitting ≤ K candidates per (key, partition)
    *      — the same partial top-k shape as Similarity.bruteForceTopK;
    *   2. groupBy(key) over candidates only (≤ K·partitions ids per key, a
    *      bounded set of longs — never the key's full row set) computes the
    *      exact kth-smallest threshold;
    *   3. the one-row-per-key threshold table joins back (auto-broadcast
    *      when small) and `id <= kth` filters the corpus — exact because
    *      ids are unique within a key.
    */
  def sourceQuota(df: DataFrame, k: Int, keyCol: String = "source",
      idCol: String = "doc_id"): DataFrame = {
    require(k >= 1, s"quota k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    // null keys fold into one "" domain (they must still be quota'd, and a
    // null===null join predicate would otherwise drop them silently); ids
    // are assumed unique within a key (doc ids / url hashes), else "K
    // smallest" is ill-defined
    val pairs = df
      .select(coalesce(col(keyCol).cast("string"), lit("")).as("key"),
        col(idCol).cast("long").as("id"))
      .as[(String, Long)]
    val cands = pairs.mapPartitions { it =>
      // max-heap per key of the K smallest ids seen in this partition
      val heaps = scala.collection.mutable.HashMap
        .empty[String, java.util.PriorityQueue[java.lang.Long]]
      it.foreach { case (key, id) =>
        val h = heaps.getOrElseUpdate(key,
          new java.util.PriorityQueue[java.lang.Long](k + 1,
            java.util.Comparator.reverseOrder[java.lang.Long]()))
        if (h.size < k) h.add(id)
        else if (h.peek() > id) { h.poll(); h.add(id) }
      }
      heaps.iterator.flatMap { case (key, h) =>
        import scala.jdk.CollectionConverters._
        h.iterator().asScala.map(id => (key, id.longValue()))
      }
    }.toDF("__gq_key", "__gq_id") // prefixed: must not collide with df's columns
    val kth = cands.groupBy(col("__gq_key")).agg(
      element_at(slice(sort_array(collect_list(col("__gq_id"))), 1, k), -1)
        .as("__gq_kth"))
    df.join(kth,
        coalesce(col(keyCol).cast("string"), lit("")) === col("__gq_key"))
      .filter(col(idCol).cast("long") <= col("__gq_kth"))
      .drop("__gq_key", "__gq_kth")
  }

  /** Deterministic hash split: keep a row iff the first hex nibble of
    * md5(id as string) falls below `keepNibbles` (of 16) — e.g. 8 keeps an
    * expected 50%. Content-keyed, so the selection is stable across reruns,
    * partitionings, and engines (md5 is the same everywhere — the d02
    * content_md5 precedent), unlike `rand()`-based sampling. Narrow, no
    * shuffle. */
  def hashSample(df: DataFrame, keepNibbles: Int,
      idCol: String = "doc_id"): DataFrame = {
    require(keepNibbles >= 0 && keepNibbles <= 16,
      s"keepNibbles must be in [0,16], got $keepNibbles")
    val nibble = substring(
      md5(to_binary(col(idCol).cast("string"), lit("utf-8"))), 1, 1)
    val bound = "0123456789abcdefg".charAt(keepNibbles).toString
    df.filter(nibble < lit(bound))
  }

  /** Deterministic stratified (mixture) sampling: per-group keep-rates over
    * the same stable content hash as [[hashSample]] — the source/language
    * REWEIGHTING step of corpus mixing (down-weight an over-represented
    * source or language to a target distribution, Pile/Dolma-style). A row
    * in group g survives iff the first FOUR hex nibbles of md5(id as
    * string) fall below floor(rate_g × 65536), giving 1/65536-granular
    * rates with hashSample's rerun/engine/partitioning stability — and
    * because every group thresholds the SAME hash, kept sets NEST as rates
    * grow (the 25% sample is a subset of the 50% sample), so retuning a
    * mixture only adds or removes documents, never churns them.
    *
    * Groups absent from `rates` (and null groups) keep `defaultRate`. The
    * rate table is mixture-weights-sized (tens of entries), so it compiles
    * into a when-chain: pure narrow filter, zero exchange, whole-stage
    * codegen — at 10^12 rows this is a scan-speed pass. */
  def stratifiedSample(df: DataFrame, rates: Map[String, Double],
      groupCol: String = "lang", idCol: String = "doc_id",
      defaultRate: Double = 1.0): DataFrame = {
    def hex4(rate: Double): String = {
      require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
      val t = math.floor(rate * 65536).toLong
      if (t >= 65536) "g" else f"$t%04x" // 'g' > every hex char: keep all
    }
    val nib4 = substring(
      md5(to_binary(col(idCol).cast("string"), lit("utf-8"))), 1, 4)
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(lit(hex4(defaultRate))) {
      case (acc, (g, r)) =>
        when(col(groupCol).cast("string") === lit(g), lit(hex4(r)))
          .otherwise(acc)
    }
    df.filter(nib4 < threshold)
  }
}
