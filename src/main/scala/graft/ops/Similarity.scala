package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Similarity search over an embedding column (Array[Float]).
  *
  * All dot products run as Catalyst higher-order functions (zip_with +
  * aggregate → whole-stage codegen, no UDF), with every element cast to
  * DOUBLE and summed left-to-right in index order — the same fold the DuckDB
  * oracle performs, so scores are bit-comparable.
  *
  * Scale paths:
  *   - bruteForceTopK: exact; the query side is tiny and broadcast, the big
  *     side streams — one pass over the corpus, no shuffle of embeddings.
  *   - lshTopK: random-hyperplane signatures bucket the corpus (one narrow
  *     map + one shuffle on short keys); queries probe only their bucket —
  *     the IVF/LSH 100 TB path (recall < 1, measured against brute force in
  *     tests).
  */
object Similarity {

  /** sum(a[i]*b[i]) as double, left fold in index order — higher-order-
    * function form, kept for mixed-type operands (e.g. float emb × double
    * hyperplane literals in signatureExpr). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine over float vectors via the native codegen'd graft_dot expression
    * (same double fold, no per-pair zipped-array allocation —
    * graft.functions.FloatVecDot). */
  def cosine(a: Column, b: Column): Column = {
    import graft.functions.VecFunctions.dotF
    // zero-norm guard: under ANSI mode (Spark 4 default) 0/0 THROWS
    // DIVIDE_BY_ZERO and kills the job on one zero embedding; NaN keeps the
    // pre-ANSI "no similarity" semantics, and topKPerQuery's heap skips NaN
    // candidates (Double.compare would otherwise rank NaN first)
    val denom = sqrt(dotF(a, a)) * sqrt(dotF(b, b))
    when(denom === 0.0, lit(Double.NaN)).otherwise(dotF(a, b) / denom)
  }

  /** Per-partition bounded-heap top-k per query over (query_id, neighbor_id,
    * sim) rows, then a merge of the tiny per-partition candidate sets.
    *
    * This replaces `row_number() over (partition by query_id)`: the window
    * form shuffles every scored (corpus × query) row into ONE partition per
    * query — for brute force that is the whole corpus in a single task, a
    * straggler/OOM at scale. Here no partition ever emits more than
    * |queries|·k candidate rows, and only those shuffle. Ordering is exact on
    * (sim desc, neighbor_id asc) — bit-identical double compares — so ranks
    * match the window/oracle version row for row. */
  private[ops] def topKPerQuery(scored: DataFrame, k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    // worse-first ordering for the eviction heap: lower sim is worse; equal
    // sim and higher neighbor_id is worse (the rank tie-break inverted)
    val worseFirst: Ordering[(Long, Double)] = new Ordering[(Long, Double)] {
      def compare(a: (Long, Double), b: (Long, Double)): Int = {
        val c = java.lang.Double.compare(b._2, a._2)
        if (c != 0) c else java.lang.Long.compare(a._1, b._1)
      }
    }
    val partial = scored
      .select(col("query_id").cast("long"), col("neighbor_id").cast("long"),
        col("sim").cast("double"))
      .as[(Long, Long, Double)]
      .mapPartitions { it =>
        val heaps = scala.collection.mutable.LongMap
          .empty[scala.collection.mutable.PriorityQueue[(Long, Double)]]
        it.foreach { case (qid, nid, sim) =>
          // NaN sim (zero-norm embedding: 0/0 in cosine) is "no similarity",
          // but Double.compare ranks NaN ABOVE every real — unguarded it
          // would evict genuine neighbors and sort to rank 1 for every query
          if (!sim.isNaN) {
            val h = heaps.getOrElseUpdate(qid,
              scala.collection.mutable.PriorityQueue.empty[(Long, Double)](worseFirst))
            if (h.size < k) h.enqueue((nid, sim))
            else if (worseFirst.compare((nid, sim), h.head) < 0) {
              h.dequeue(); h.enqueue((nid, sim))
            }
          }
        }
        heaps.iterator.flatMap { case (qid, h) => h.iterator.map(c => (qid, c._1, c._2)) }
      }
    partial
      .groupByKey(_._1)
      .flatMapGroups { (qid: Long, it: Iterator[(Long, Long, Double)]) =>
        // ascending by worseFirst = best candidates first
        val best = it.map(c => (c._2, c._3)).toArray.sorted(worseFirst).take(k)
        best.iterator.zipWithIndex.map { case ((nid, _), i) => (qid, nid, i + 1) }
      }
      .toDF("query_id", "neighbor_id", "rank")
  }

  /** Exact top-k cosine neighbors for the query rows (vec_id in queryIds).
    * Query side broadcast; corpus side never shuffled; top-k via bounded
    * per-partition heaps (only |queries|·k rows per partition ever shuffle). */
  def bruteForceTopK(emb: DataFrame, queryIds: Seq[Long], k: Int = 10): DataFrame = {
    val q = emb.filter(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = emb.select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"))
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("q_emb"), col("n_emb")))
    topKPerQuery(scored, k)
  }

  /** Deterministic pseudo-gaussian hyperplanes (sum of 4 xorshift draws),
    * shared by the literal-expression and broadcast signature paths. */
  private[graft] def planesFor(dim: Int, bits: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(bits, dim) { (b, d) =>
      var x = seed + b * 1341L + d * 7919L + 1
      var s = 0.0
      var k = 0
      while (k < 4) {
        x ^= x << 13; x ^= x >>> 7; x ^= x << 17
        s += (x.toDouble / Long.MaxValue)
        k += 1
      }
      s / 2.0
    }

  /** Random-hyperplane LSH signature as a Catalyst column: rows sharing a
    * signature land in one bucket.
    *
    * NOTE: inlines `bits * dim` plane coefficients as plan LITERALS — fine at
    * test dims, but at production dims (768+) x 24 bits x several tables that
    * is ~100k literals in one expression tree: plan bloat and codegen
    * fallback (64KB method limit). The production paths ([[lshTopK]],
    * [[nearDupPairsLsh]]) therefore compute signatures via
    * [[withSignatures]] — a typed map over a BROADCAST plane matrix,
    * bit-identical to this expression (OpsSpec asserts equality at dim 16
    * and dim 768). Kept as the readable reference form and for SQL callers. */
  def signatureExpr(emb: Column, dim: Int, bits: Int, seed: Long): Column = {
    val planes = planesFor(dim, bits, seed)
    (0 until bits).map { b =>
      val proj = aggregate(
        zip_with(emb, lit(planes(b)), (x, p) => x.cast("double") * p),
        lit(0.0), (acc, x) => acc + x)
      when(proj > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** (vec_id, embedding) -> (vec_id, embedding, buckets ARRAY<LONG>) with one
    * random-hyperplane signature per seed, computed in a typed narrow map
    * over a broadcast plane matrix — constant plan size at any dim/bits
    * (the scale-safe form of [[signatureExpr]]; same double multiply-add in
    * index order, so signatures are bit-identical — INCLUDING ragged rows: a
    * null or wrong-length embedding null-poisons the expression's zip_with
    * projection, so every bit is 0 there; this path emits signature 0 for
    * exactly those rows instead of folding the available dims, keeping the
    * two forms interchangeable at any input shape). */
  def withSignatures(emb: DataFrame, dim: Int, bits: Int, seeds: Seq[Long]): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(seeds.map(s => planesFor(dim, bits, s)).toArray)
    emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val tables = bc.value
        it.map { case (id, e) =>
          val sigs = new Array[Long](tables.length)
          // ragged guard: sigs stay 0, matching signatureExpr's null semantics
          if (e != null && e.length == dim) {
            var t = 0
            while (t < tables.length) {
              val tbl = tables(t)
              var sig = 0L
              var b = 0
              while (b < tbl.length) {
                val plane = tbl(b)
                var s = 0.0
                var d = 0
                while (d < dim) { s += e(d).toDouble * plane(d); d += 1 }
                if (s > 0) sig |= 1L << b
                b += 1
              }
              sigs(t) = sig
              t += 1
            }
          }
          (id, e, sigs)
        }
      }
      .toDF("vec_id", "embedding", "buckets")
  }

  /** Signature width scaled to the corpus: bits ≈ log2(n / targetBucket),
    * clamped to [4, 24] — expected bucket occupancy stays ~targetBucket as
    * the corpus grows, so probe cost is flat from sf0.001 to 10^12 rows
    * instead of buckets going quadratic at a fixed width. `n` comes from
    * `count()` on the source, which parquet answers from footer metadata. */
  def autoBits(n: Long, targetBucket: Int = 64): Int = {
    val raw = math.ceil(math.log(math.max(1.0, n.toDouble / targetBucket)) / math.log(2.0)).toInt
    math.max(4, math.min(24, raw))
  }

  /** Multi-probe LSH approximate top-k: each query probes its own bucket plus
    * every bucket at Hamming distance 1 (bit flips) — the standard recall
    * boost that costs `bits` extra broadcast rows per query instead of a
    * second hash table (Lv et al., VLDB'07). The corpus side stays bucketed
    * once and is never shuffled; only the tiny query set explodes.
    * `bits <= 0` (the default) derives the signature width from the corpus
    * count via [[autoBits]]. */
  def lshTopK(emb: DataFrame, queryIds: Seq[Long], dim: Int,
      k: Int = 10, bits: Int = 0, seed: Long = 42L): DataFrame = {
    val nBits = if (bits > 0) bits else autoBits(emb.count())
    // broadcast-plane signatures: constant plan size at any dim (see
    // withSignatures; bit-identical to the signatureExpr literal form).
    // The query side signs its OWN tiny isin-filtered scan: signatures are
    // row-local, and filtering bucketed instead would sit the isin above a
    // typed mapPartitions — no pushdown, so the full-corpus signature pass
    // would run twice (once to keep a handful of query rows, once for the
    // corpus join side).
    val bucketed = withSignatures(emb, dim, nBits, Seq(seed))
      .select(col("vec_id"), col("embedding"), col("buckets").getItem(0).as("bucket"))
    val flips = array((0 until nBits).map(b => lit(1L << b)) :+ lit(0L): _*)
    val q = withSignatures(emb.filter(col("vec_id").isin(queryIds: _*)),
        dim, nBits, Seq(seed))
      .select(col("vec_id"), col("embedding"), col("buckets").getItem(0).as("bucket"))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        explode(transform(flips, f => col("bucket").bitwiseXOR(f))).as("bucket"))
    val scored = bucketed
      .select(col("vec_id").as("neighbor_id"), col("embedding").as("n_emb"), col("bucket"))
      .join(broadcast(q), Seq("bucket"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("q_emb"), col("n_emb")))
    topKPerQuery(scored, k)
  }

  /** Nearest-centroid assignment kernel shared by the IVF k-means trainer,
    * the corpus-assignment map, and [[ivfAssignWitness]]: argmin of squared
    * L2 over the first `dim` entries, accumulated in index order in double,
    * lowest index winning exact ties. Factored out so the oracle witness
    * exercises the same code the production path runs. */
  private[graft] def nearestCell(v: Array[Float], cs: Array[Array[Double]],
      dim: Int): Int = {
    var best = 0; var bestD = Double.MaxValue
    var c = 0
    while (c < cs.length) {
      var d = 0.0; var i = 0
      while (i < dim) { val t = v(i) - cs(c)(i); d += t * t; i += 1 }
      if (d < bestD) { bestD = d; best = c }
      c += 1
    }
    best
  }

  /** IVF-assignment oracle witness: assign every well-formed vector to its
    * nearest of the GIVEN literal centroids via the production
    * [[nearestCell]] kernel → (vec_id, cell). Pins the assignment semantics
    * the trained-k-means path (d13) cannot expose to SQL — argmin squared-L2
    * with index-order double accumulation and lowest-index tie-break — in a
    * DuckDB oracle whose SQL embeds the same centroid literals. Ragged rows
    * (null or shorter than the centroid dim) are excluded exactly as
    * [[ivfTopK]] excludes them ("never a candidate"). Narrow map over a
    * broadcast centroid matrix: no shuffle, scan-speed at any corpus size. */
  def ivfAssignWitness(emb: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    val dim = centroids(0).length
    require(centroids.forall(_.length == dim), "ragged centroid matrix")
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(centroids)
    emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .filter(r => r._2 != null && r._2.length >= dim)
      .map { case (id, v) => (id, nearestCell(v, bc.value, dim)) }
      .toDF("vec_id", "cell")
  }

  /** IVF (inverted-file) approximate top-k: a coarse k-means quantizer over a
    * driver-side sample partitions the corpus into cells; queries probe the
    * `nProbe` nearest centroids and score only those cells (Jégou et al.,
    * PAMI'11). One narrow assignment map over the corpus, broadcast
    * centroids + queries, no corpus shuffle — the second standard scale path
    * next to multi-probe LSH. */
  /** Coarse k-means quantizer (10 iters, seeded init) on a deterministic
    * corpus sample — small and driver-side by design, like any IVF training
    * step. Ordering by a seeded hash of vec_id makes the sample (a)
    * identical at any parallelism level — same-job-same-result across N and
    * 4N executors — and (b) spread across the id space; orderBy+limit
    * compiles to TakeOrdered (per-partition top-k + driver merge, no sort
    * shuffle of the corpus). Ragged sample rows are dropped so the k-means
    * inner loops index safely. Shared by [[ivfTopK]] and the trained-
    * centroid [[semDedup]] path. */
  def trainCentroids(emb: DataFrame, nCells: Int = 16, sampleN: Int = 4096,
      seed: Long = 42L): Array[Array[Double]] = {
    val spark = emb.sparkSession
    import spark.implicits._
    val sample0 = emb
      .filter(col("embedding").isNotNull)
      .select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id"), lit(seed)), col("vec_id"))
      .limit(sampleN)
      .select(col("embedding")).as[Array[Float]].collect()
    require(sample0.nonEmpty, "empty corpus")
    val dim = sample0(0).length
    val sample = sample0.filter(_.length == dim)
    val rnd = new java.util.Random(seed)
    var centroids = Array.tabulate(math.min(nCells, sample.length))(i =>
      sample(rnd.nextInt(sample.length)).map(_.toDouble))
    for (_ <- 0 until 10) {
      val sums = Array.fill(centroids.length)(new Array[Double](dim))
      val counts = new Array[Int](centroids.length)
      for (v <- sample) {
        val c = nearestCell(v, centroids, dim)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = centroids.indices.map { c =>
        if (counts(c) == 0) centroids(c)
        else sums(c).map(_ / counts(c))
      }.toArray
    }
    centroids
  }

  def ivfTopK(emb: DataFrame, queryIds: Seq[Long], k: Int = 10,
      nCells: Int = 16, nProbe: Int = 4, sampleN: Int = 4096,
      seed: Long = 42L): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    // ragged rows (null / shorter-than-dim embeddings — the exact shapes
    // withSignatures tolerates with sig 0) would NPE/AIOOBE inside nearest()
    // and kill the job: exclude them from both the index and the queries,
    // matching the LSH path's "never a candidate" semantics
    val vecs = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .filter(r => r._2 != null)
    val centroids = trainCentroids(emb, nCells, sampleN, seed)
    val dim = centroids(0).length
    val bcCentroids = spark.sparkContext.broadcast(centroids)
    // assign corpus rows to cells (narrow map; no shuffle); ragged short
    // rows are excluded the same way the LSH path never candidates them
    val assigned = vecs.filter(_._2.length >= dim)
      .map { case (id, v) => (nearestCell(v, bcCentroids.value, dim), id, v) }
      .toDF("cell", "neighbor_id", "n_emb")
    // queries probe their nProbe nearest cells
    // Set membership, not Seq.contains — a Seq would linear-scan per corpus row
    val qSet = queryIds.toSet
    val queries = vecs.filter(r => qSet.contains(r._1) && r._2.length >= dim).collect()
    val probes = queries.flatMap { case (qid, qv) =>
      val byDist = centroids.indices.sortBy { c =>
        var d = 0.0; var i = 0
        while (i < dim) { val t = qv(i) - centroids(c)(i); d += t * t; i += 1 }
        d
      }
      byDist.take(nProbe).map(c => (c, qid, qv))
    }
    val qDF = spark.createDataset(probes.toSeq).toDF("cell", "query_id", "q_emb")
    val scored = assigned.join(broadcast(qDF), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("q_emb"), col("n_emb")))
    topKPerQuery(scored, k)
  }

  /** Near-duplicate pairs via LSH-prefilter + exact verify — the 10^12-row
    * path: the blocked product below is exact but O(n²) work however it is
    * partitioned; this variant generates candidates only from rows sharing a
    * random-hyperplane signature bucket (narrow map + ONE shuffle on the
    * short bucket key, hot buckets capped like minhash), then verifies each
    * candidate with the exact cosine (native graft_dot). Recall < 1 by
    * construction (LSH misses some borderline pairs) — measured against the
    * exact product in OpsSpec. `bits <= 0` (the default) scales the signature
    * width with the corpus count ([[autoBits]]) so bucket occupancy stays
    * bounded as the corpus grows.
    *
    * Returns the MATERIALIZED pair set (persisted MEMORY_AND_DISK, already
    * computed); the corpus-side cache used during candidate generation is
    * released before returning, so repeated invocations in a long session
    * don't pin the corpus. Caller may `unpersist()` the (small) result.
    * `materialize = false` is explain/audit-only — executing that plan
    * builds an ownerless corpus cache (see Dedup.minhashPairs). */
  def nearDupPairsLsh(emb: DataFrame, threshold: Double, dim: Int,
      bits: Int = 0, nTables: Int = 6, seed: Long = 42L,
      maxBucket: Int = 1024, materialize: Boolean = true): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val nBits = if (bits > 0) bits else autoBits(emb.count())
    // OR-construction: nTables independent hyperplane tables; a pair is a
    // candidate if it shares a bucket in ANY table (recall 1-(1-p^bits)^T).
    // The explode keys on (table, bucket) so all tables ride one shuffle.
    val vecs = emb.select(col("vec_id").cast("long").as("vec_id"), col("embedding"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // one broadcast-plane pass computes ALL table signatures (constant plan
    // size at any dim — the literal signatureExpr form would inline
    // nTables x bits x dim coefficients here)
    val banded = withSignatures(vecs, dim, nBits, (0 until nTables).map(t => seed + t * 1000003L))
      .select(col("vec_id"), posexplode(col("buckets")).as(Seq("tbl", "bucket")))
      .select(col("tbl"), col("bucket"), col("vec_id"))
    val candidates = banded
      .groupByKey(r => (r.getInt(0), r.getLong(1)))
      .flatMapGroups { (_: (Int, Long), it: Iterator[org.apache.spark.sql.Row]) =>
        val ids = it.map(_.getLong(2)).take(maxBucket + 1).toArray
        if (ids.length > maxBucket) Iterator.empty // degenerate bucket: skip
        else {
          java.util.Arrays.sort(ids)
          for {
            i <- ids.indices.iterator
            j <- (i + 1) until ids.length
          } yield (ids(i), ids(j))
        }
      }
      .toDF("id_a", "id_b")
      .distinct()
    val va = vecs.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"))
    val vb = vecs.select(col("vec_id").as("id_b"), col("embedding").as("emb_b"))
    val out = candidates
      .join(va, "id_a").join(vb, "id_b")
      .filter(cosine(col("emb_a"), col("emb_b")) >= threshold)
      .select(col("id_a"), col("id_b"))
    if (!materialize) out // plan-only: nothing executed, nothing cached yet
    else {
      val cached = out.persist(StorageLevel.MEMORY_AND_DISK)
      cached.count() // materialize so the corpus cache can be released now
      vecs.unpersist()
      cached
    }
  }

  /** Exact near-duplicate pairs by embedding cosine >= threshold, upper
    * triangle only.
    *
    * Executed as a blocked broadcast JOIN: the corpus is split into
    * deterministic hash blocks of <= maxBroadcast vectors and each block is
    * the broadcast side of one BroadcastNestedLoopJoin branch, with the
    * score — graft_dot(a,b)/(norm_a*norm_b), the oracle's exact fold —
    * evaluated inside the codegen'd join condition. Nothing is ever
    * collected to the driver: broadcast relations materialize on executors
    * at execution time, so memory is bounded by the block size plus the
    * scan. Each unordered pair is emitted exactly once (by the block
    * holding the larger id, upper triangle), so the union over blocks is
    * duplicate-free. For 1e9+ corpora prefer nearDupPairsLsh — any exact
    * all-pairs method is O(n²) work however it is partitioned.
    *
    * Block sizes are `maxBroadcast` IN EXPECTATION (hash-assigned): at the
    * default 2^20 the relative deviation concentrates within ~±0.5%
    * (Chernoff), so the broadcast budget holds without the global sort a
    * row_number-exact split would cost. Zero-norm vectors have DEFINED
    * similarity 0.0 (never NaN). The (vec_id, embedding, nrm) projection is
    * persisted so the B union branches scan the corpus once, then released
    * after the (small) pair set is materialized — the returned DF is
    * persisted and already computed; caller may `unpersist()` it. */
  def nearDupPairs(emb: DataFrame, threshold: Double,
      maxBroadcast: Int = 1 << 20): DataFrame = {
    val (union, nd) = nearDupPairsPlan(emb, threshold, maxBroadcast)
    val out = union.persist(StorageLevel.MEMORY_AND_DISK)
    out.count() // materialize so the corpus-projection cache can be released
    nd.unpersist()
    out
  }

  /** The unmaterialized (pairUnion, cachedProjection) pair behind
    * nearDupPairs — exposed so plan audits can assert the branch shape
    * (BroadcastNestedLoopJoin over InMemoryTableScan) before execution. */
  private[graft] def nearDupPairsPlan(emb: DataFrame, threshold: Double,
      maxBroadcast: Int): (DataFrame, DataFrame) = {
    import graft.functions.VecFunctions.dotF
    // norms precomputed once per side; the join condition then costs ONE dot
    // per pair (the HOF formulation recomputed two norms per pair, 40x cost)
    val nd = emb.select(col("vec_id").cast("long").as("vec_id"),
      col("embedding"), sqrt(dotF(col("embedding"), col("embedding"))).as("nrm"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    // parquet sources answer count() from footer metadata — no compute pass
    val total = emb.count()
    val nBlocks = math.max(1L, (total + maxBroadcast - 1) / maxBroadcast).toInt
    val blockOf = pmod(xxhash64(col("vec_id")), lit(nBlocks.toLong))
    val a = nd.select(col("vec_id").as("id_a"), col("embedding").as("emb_a"),
      col("nrm").as("nrm_a"))
    // guarded cosine: zero-norm product → sim 0.0, not NaN (NaN >= t is
    // false for any t, so thresholds > 0 were unaffected, but t <= 0 was
    // undefined; the kernel's sim is 0.0 for zero vectors)
    val prod = col("nrm_a") * col("nrm_b")
    val sim = when(prod > 0.0, dotF(col("emb_a"), col("emb_b")) / prod).otherwise(lit(0.0))
    val parts = (0 until nBlocks).map { b =>
      val block = (if (nBlocks == 1) nd else nd.filter(blockOf === b.toLong))
        .select(col("vec_id").as("id_b"), col("embedding").as("emb_b"),
          col("nrm").as("nrm_b"))
      a.join(broadcast(block), col("id_b") > col("id_a") && sim >= threshold)
        .select(col("id_a"), col("id_b"))
    }
    (parts.reduce(_ union _), nd)
  }

  /** Production [[semDedup]]: centroids trained by the shared IVF k-means
    * ([[trainCentroids]] — deterministic sample, same result at any
    * parallelism; the one Spark job this overload runs at build time).
    * `nCells` should grow with the corpus so cells stay bounded (the
    * paper's k ∝ corpus size); the explicit-centroid overload is the
    * oracle-able form (d41). */
  def semDedup(emb: DataFrame, nCells: Int, threshold: Double,
      maxCell: Int, sampleN: Int, seed: Long): DataFrame =
    semDedup(emb, trainCentroids(emb, nCells, sampleN, seed), threshold,
      maxCell)

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic deduplication
    * by clustering the embedding space and keeping exactly one example from
    * each group of semantically near-identical examples within a cluster.
    *
    * The key structural fact — SemDeDup compares only WITHIN a cluster, so
    * duplicate groups can never span cells — makes the whole graph stage
    * local: the plan is one narrow assignment map over BROADCAST centroids
    * (the production [[nearestCell]] kernel d13/d37 run, computing each
    * row's cosine to its own centroid in the same pass), then ONE shuffle
    * keyed on the short cell id into a per-cell task that computes the
    * ε-graph (cosine ≥ `threshold`), its connected components (union-find),
    * and the keep rule in memory. No self-join, no iterative label
    * propagation, no driver-side state, and the quadratic term is bounded
    * per cell: a task holds at most `maxCell` vectors (size maxCell with
    * the embedding dim in mind — 2^16 × 768-dim floats ≈ 200 MB). Cells
    * larger than `maxCell` stream through UNDEDUPED with `capped` = 1
    * rather than silently exploding — at production scale SemDeDup grows
    * the centroid count with the corpus precisely so cells stay bounded,
    * and the cap makes that contract loud. Ragged rows (null / shorter
    * than the centroid dim) are excluded exactly as [[ivfTopK]] excludes
    * them.
    *
    * Keep rule — per duplicate group, keep the example with the LOWEST
    * cosine to its cluster centroid (the paper's choice: the least
    * prototypical member preserves the most diversity), smallest vec_id on
    * exact double ties; singletons keep. Component label = the group's
    * minimum vec_id.
    *
    * All similarity arithmetic is the oracle fold — index-order double
    * accumulation over the first `dim` entries, zero-norm rows having
    * DEFINED similarity 0.0 — so a DuckDB oracle given the same centroid
    * literals reproduces every (cell, component, keep) decision bit-exactly
    * (d41). Returns the LAZY (vec_id, cell, component, keep, capped) plan:
    * no internal caches, no jobs at build time. */
  def semDedup(emb: DataFrame, centroids: Array[Array[Double]],
      threshold: Double, maxCell: Int = 1 << 16): DataFrame = {
    require(centroids.nonEmpty, "need at least one centroid")
    val dim = centroids(0).length
    require(centroids.forall(_.length == dim), "ragged centroid matrix")
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    require(maxCell >= 1, s"maxCell must be >= 1, got $maxCell")
    val spark = emb.sparkSession
    import spark.implicits._
    // centroid norms are driver-side constants, computed with the same
    // index-order fold the oracle embeds as literals
    val cNorms = centroids.map { c =>
      var s = 0.0; var i = 0
      while (i < dim) { s += c(i) * c(i); i += 1 }
      math.sqrt(s)
    }
    val bcC = spark.sparkContext.broadcast(centroids)
    val bcN = spark.sparkContext.broadcast(cNorms)
    val assigned = emb.select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])]
      .filter(r => r._2 != null && r._2.length >= dim)
      .map { case (id, v) =>
        val cell = nearestCell(v, bcC.value, dim)
        var dc = 0.0; var nv = 0.0; var i = 0
        while (i < dim) {
          val x = v(i).toDouble
          dc += x * bcC.value(cell)(i); nv += x * x; i += 1
        }
        val nrm = math.sqrt(nv)
        val den = nrm * bcN.value(cell)
        val csim = if (den > 0.0) dc / den else 0.0
        (cell, id, csim, nrm, v.take(dim))
      }
    assigned.groupByKey(_._1)
      .flatMapGroups { (cell, it) =>
        // buffer at most maxCell + 1 members to detect the cap; an oversized
        // cell streams through (buffered head + lazy tail), never
        // materializing in task memory
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Double, Double, Array[Float])]
        var over = false
        while (!over && it.hasNext) {
          val r = it.next()
          buf += ((r._2, r._3, r._4, r._5))
          if (buf.length > maxCell) over = true
        }
        if (over)
          buf.iterator.map(m => (m._1, cell, m._1, 1, 1)) ++
            it.map(r => (r._2, cell, r._2, 1, 1))
        else {
          // deterministic local order (shuffle order is not): sort by id;
          // union-find parents always point to the SMALLER index, so each
          // component's root index carries its minimum vec_id
          val ms = buf.sortBy(_._1).toArray
          val n = ms.length
          val parent = Array.tabulate(n)(identity)
          def find(x: Int): Int = {
            var r = x
            while (parent(r) != r) r = parent(r)
            var c = x
            while (parent(c) != c) { val nx = parent(c); parent(c) = r; c = nx }
            r
          }
          var i = 0
          while (i < n) {
            var j = i + 1
            while (j < n) {
              // the oracle fold: index-order double dot over the dim slice,
              // zero-norm products => DEFINED similarity 0.0 (no edge)
              val prod = ms(i)._3 * ms(j)._3
              if (prod > 0.0) {
                val va = ms(i)._4; val vb = ms(j)._4
                var d = 0.0; var k = 0
                while (k < dim) { d += va(k).toDouble * vb(k).toDouble; k += 1 }
                if (d / prod >= threshold) {
                  val ri = find(i); val rj = find(j)
                  if (ri != rj) parent(math.max(ri, rj)) = math.min(ri, rj)
                }
              }
              j += 1
            }
            i += 1
          }
          // keep = argmin (csim, vec_id) per component: ids ascend with the
          // index, so a strict < scan lands ties on the smallest vec_id
          val bestIdx = new java.util.HashMap[Int, Int]()
          i = 0
          while (i < n) {
            val r = find(i)
            val b = bestIdx.getOrDefault(r, -1)
            if (b < 0 || ms(i)._2 < ms(b)._2) bestIdx.put(r, i)
            i += 1
          }
          (0 until n).iterator.map { idx =>
            val r = find(idx)
            (ms(idx)._1, cell, ms(r)._1,
              if (bestIdx.get(r) == idx) 1 else 0, 0)
          }
        }
      }
      .toDF("vec_id", "cell", "component", "keep", "capped")
  }
}
