package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.ops.Sampling

/** Planted-truth tests for the corpus-curation sampling operators. */
class SamplingSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-sampling-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val docs = {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    // ids deliberately interleaved and out of order; hot > k, cold < k;
    // repartition(5) scatters each source across partitions so phase 1's
    // per-partition heaps must actually merge in phase 2
    val rows = Seq(
      (30L, "hot"), (10L, "hot"), (50L, "hot"), (20L, "hot"), (40L, "hot"),
      (11L, "cold"), (31L, "cold"),
      (7L, "mid"), (5L, "mid"), (9L, "mid")
    )
    rows.toDF("doc_id", "source").repartition(5)
  }

  test("sourceQuota keeps exactly the k smallest ids per source") {
    val kept = Sampling.sourceQuota(docs, k = 3)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(kept("hot") == Seq(10L, 20L, 30L)) // 40, 50 dropped
    assert(kept("cold") == Seq(11L, 31L))     // under quota: all kept
    assert(kept("mid") == Seq(5L, 7L, 9L))    // exactly at quota
  }

  test("sourceQuota k=1 keeps only each source's minimum id") {
    val kept = Sampling.sourceQuota(docs, k = 1)
      .collect().map(r => (r.getAs[String]("source"), r.getAs[Long]("doc_id")))
      .toSet
    assert(kept == Set(("hot", 10L), ("cold", 11L), ("mid", 5L)))
  }

  test("sourceQuota preserves all original columns") {
    import spark.implicits._
    val df = Seq((1L, "s", "body")).toDF("doc_id", "source", "text")
    val out = Sampling.sourceQuota(df, k = 2)
    assert(out.columns.toSeq == Seq("doc_id", "source", "text"))
    assert(out.collect().head.getAs[String]("text") == "body")
  }

  test("sourceQuota: null keys are quota'd as one domain, not dropped") {
    import spark.implicits._
    val df = Seq((1L, Option.empty[String]), (2L, None), (3L, None),
      (4L, Some("s"))).toDF("doc_id", "source")
    val kept = Sampling.sourceQuota(df, k = 2)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(kept == Set(1L, 2L, 4L)) // null domain capped at 2: doc 3 dropped
  }

  test("sourceQuota tolerates input columns named key/kth") {
    import spark.implicits._
    val df = Seq((1L, "s", "user-key", "user-kth"))
      .toDF("doc_id", "source", "key", "kth")
    val out = Sampling.sourceQuota(df, k = 1)
    assert(out.columns.toSeq == Seq("doc_id", "source", "key", "kth"))
    val r = out.collect().head
    assert(r.getAs[String]("key") == "user-key" && r.getAs[String]("kth") == "user-kth")
  }

  test("hashSample matches the per-row md5 predicate and is deterministic") {
    import spark.implicits._
    val df = (0L until 200L).toDF("doc_id")
    val kept = Sampling.hashSample(df, keepNibbles = 8)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    val expected = (0L until 200L).filter { id =>
      val h = md.digest(id.toString.getBytes("UTF-8"))
      ((h(0) >> 4) & 0xF) < 8
    }.toSet
    assert(kept == expected)
    assert(expected.size > 50 && expected.size < 150) // ~50% by construction
    val again = Sampling.hashSample(df, keepNibbles = 8)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(again == kept)
  }

  test("hashSample bounds: 0 keeps nothing, 16 keeps everything") {
    import spark.implicits._
    val df = (0L until 50L).toDF("doc_id")
    assert(Sampling.hashSample(df, 0).count() == 0L)
    assert(Sampling.hashSample(df, 16).count() == 50L)
  }

  test("hashSample keyed on a group column keeps or drops each group whole") {
    import spark.implicits._
    // 40 hosts x 5 docs: a GROUP-keyed split (d32, leakage hygiene) must
    // never separate two docs of the same host into different splits
    val df = (0L until 200L).map(i => (i, s"host${i % 40}")).toDF("doc_id", "source")
    val kept = Sampling.hashSample(df, keepNibbles = 8, idCol = "source")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val keptHosts = kept.map(_._2).toSet
    // all-or-none per host
    for (h <- keptHosts)
      assert(kept.count(_._2 == h) == 5, s"host $h split across the boundary")
    // and the host decision matches the per-row md5 predicate
    val md = java.security.MessageDigest.getInstance("MD5")
    val expectedHosts = (0 until 40).map(i => s"host$i").filter { h =>
      ((md.digest(h.getBytes("UTF-8"))(0) >> 4) & 0xF) < 8
    }.toSet
    assert(keptHosts == expectedHosts)
  }

  /** First four hex nibbles of md5(s) as an int in [0, 65536). */
  private def md5Nib4(s: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(0) & 0xFF) << 8) | (d(1) & 0xFF)
  }

  test("stratifiedSample matches the per-row md5 threshold predicate per group") {
    import spark.implicits._
    val df = (0L until 400L).map(i =>
      (i, Seq("en", "zh", "de", "fr")((i % 4).toInt))).toDF("doc_id", "lang")
    val rates = Map("en" -> 0.5, "zh" -> 0.25)
    val kept = Sampling.stratifiedSample(df, rates)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val expected = (0L until 400L).map(i =>
      (i, Seq("en", "zh", "de", "fr")((i % 4).toInt))).filter { case (i, g) =>
      md5Nib4(i.toString) < math.floor(rates.getOrElse(g, 1.0) * 65536).toInt
    }.toSet
    assert(kept == expected)
    // unknown groups kept whole at the default rate 1.0
    assert(kept.count(_._2 == "de") == 100 && kept.count(_._2 == "fr") == 100)
    // and en was genuinely downweighted below de
    assert(kept.count(_._2 == "en") < 100)
  }

  test("stratifiedSample kept sets nest as rates grow; null groups take the default; bad rates reject") {
    import spark.implicits._
    val df = (0L until 300L).map(i =>
      (i, if (i % 10 == 0) null else "en")).toDF("doc_id", "lang")
    def keptAt(r: Double): Set[Long] =
      Sampling.stratifiedSample(df, Map("en" -> r), defaultRate = 0.0)
        .collect().map(_.getLong(0)).toSet
    val at25 = keptAt(0.25); val at50 = keptAt(0.5); val at100 = keptAt(1.0)
    assert(at25.subsetOf(at50) && at50.subsetOf(at100))
    assert(at100.size == 270) // null-lang rows took defaultRate=0.0
    // null groups at default 1.0 all survive
    val withNullsKept = Sampling.stratifiedSample(df, Map("en" -> 0.0))
      .collect().map(_.getLong(0)).toSet
    assert(withNullsKept.size == 30 && withNullsKept.forall(_ % 10 == 0))
    intercept[IllegalArgumentException](
      Sampling.stratifiedSample(df, Map("en" -> 1.5)))
  }

  test("dsirWeights: target-vocabulary docs outscore off-distribution docs; empty docs 0") {
    import spark.implicits._
    // planted truth: the target model is pure 'alpha'-vocabulary; raw mixes
    // alpha docs with 'omega'-vocabulary docs the target never mentions.
    // DSIR must rank every alpha doc above every omega doc.
    val alpha = "alpha beta gamma delta alpha beta"
    val omega = "omega sigma tau rho omega sigma"
    val raw = Seq(
      (0L, alpha), (1L, omega), (2L, alpha), (3L, omega),
      (4L, alpha + " " + omega), // mixed: must land strictly between
      (5L, ""), (6L, null.asInstanceOf[String])
    ).toDF("doc_id", "text").repartition(3)
    val target = Seq((100L, alpha), (101L, alpha)).toDF("doc_id", "text")
    val out = Sampling.dsirWeights(raw, target)
    val w = out.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    try {
      assert(w.keySet == Set(0L, 1L, 2L, 3L, 4L, 5L, 6L)) // one row per raw doc
      assert(w(5L) == ((0L, 0L)) && w(6L) == ((0L, 0L)))  // token-free: 0/0
      assert(w(0L) == w(2L) && w(1L) == w(3L))            // same text, same weight
      val (alphaW, omegaW, mixedW) = (w(0L)._2, w(1L)._2, w(4L)._2)
      assert(alphaW > omegaW, s"alpha $alphaW must outscore omega $omegaW")
      // the weight is a log-likelihood SUM over tokens (longer docs sum
      // more terms), so the mixed doc is EXACTLY the sum of its halves...
      assert(mixedW == alphaW + omegaW)
      // ...and sits strictly between them PER TOKEN (6+6 vs 12 tokens)
      assert(mixedW * 6 > omegaW * 12 && mixedW * 6 < alphaW * 12,
        s"per-token mixed ${mixedW / 12.0} must land between " +
          s"${omegaW / 6.0} and ${alphaW / 6.0}")
      assert(w(0L)._1 == 6L && w(4L)._1 == 12L) // n_grams = token counts
    } finally out.unpersist() // release the materialized result cache
    intercept[IllegalArgumentException](Sampling.dsirWeights(raw, target, buckets = 1))
  }

  test("dsirWeights: materialize=false is plan-only (no jobs), broadcast bucket join, no Window") {
    import spark.implicits._
    val raw = Seq((0L, "a b c"), (1L, "d e f")).toDF("doc_id", "text")
    val target = Seq((9L, "a b")).toDF("doc_id", "text")
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val plan = Sampling.dsirWeights(raw, target, materialize = false)
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "materialize=false must not run any Spark job")
    val s = plan.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(!s.contains("Window"), "per-doc weights must never use a Window")
    assert(s.contains("BroadcastHashJoin"),
      "the bucket log-ratio table must broadcast into the corpus side")
    // the lazy plan still computes the same rows when executed
    val got = plan.collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got.keySet == Set(0L, 1L) && got(0L) > got(1L))
  }

  test("gumbelTopK: deterministic selection, weight dominance, partition invariance") {
    import spark.implicits._
    // one overwhelming weight among near-zero ones: 20 log-units above the
    // rest dwarfs any Gumbel draw, so doc 0 must be selected at every seed
    val w = ((0L, 20000000L) +: (1L to 49L).map(i => (i, -i * 1000L)))
      .toDF("doc_id", "weight_micros")
    def ids(df: org.apache.spark.sql.DataFrame, k: Int, seed: Long) =
      Sampling.gumbelTopK(df, k, seed).collect().map(_.getLong(0)).toSet
    val s1 = ids(w, 10, seed = 7L)
    assert(s1 == ids(w, 10, seed = 7L), "same seed must select the same set")
    assert(s1 == ids(w.repartition(7), 10, seed = 7L),
      "selection must not depend on partitioning")
    assert(s1.contains(0L) && ids(w, 10, seed = 8L).contains(0L) &&
      ids(w, 10, seed = 9L).contains(0L), "dominant weight always selected")
    assert(s1 != ids(w, 10, seed = 8L) || s1 != ids(w, 10, seed = 9L),
      "different seeds must be able to select different sets")
    assert(ids(w, 1000, seed = 7L).size == 50, "k >= n returns every row")
    // keys are reproducible values, not per-run randomness: re-collecting
    // yields identical key_micros row for row
    val k1 = Sampling.gumbelTopK(w, 5, 7L).collect().map(r => (r.getLong(0), r.getLong(2)))
    val k2 = Sampling.gumbelTopK(w, 5, 7L).collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(k1.sameElements(k2))
    intercept[IllegalArgumentException](Sampling.gumbelTopK(w, 0))
    intercept[IllegalArgumentException](Sampling.gumbelTopK(w, 5, temperature = 0.0))
    // plan shape: bounded per-partition top-k merged on the driver — no
    // global sort exchange, no Window
    val s = Sampling.gumbelTopK(w, 10).queryExecution
      .executedPlan.toString
    assert(s.contains("TakeOrderedAndProject"), s)
    assert(!s.contains("Window"), s)
  }

  test("unigramNll: common-vocabulary docs score lower than rare-vocabulary docs") {
    import spark.implicits._
    // LM corpus: 'common'-family tokens dominate, 'rare' appears once.
    // A doc of common tokens must have strictly lower per-token NLL than a
    // doc of rare tokens, and one whose tokens never appear in the LM
    // (smoothed zero-count mass) must score highest of all.
    val lm = (1L to 20L).map(i => (100L + i, "common tokens appear everywhere"))
      .:+((200L, "rare once")).toDF("doc_id", "text")
    val corpus = Seq(
      (0L, "common tokens appear everywhere"),
      (1L, "rare rare rare"),
      (2L, "unseen vocabulary entirely"),
      (3L, ""), (4L, null.asInstanceOf[String])
    ).toDF("doc_id", "text").repartition(3)
    val out = Sampling.unigramNll(corpus, lm)
    try {
      val m = out.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(m.keySet == Set(0L, 1L, 2L, 3L, 4L))
      assert(m(3L) == ((0L, 0L)) && m(4L) == ((0L, 0L))) // token-free: 0/0
      assert(m(0L)._2 < m(1L)._2, s"common ${m(0L)._2} must beat rare ${m(1L)._2}")
      assert(m(1L)._2 < m(2L)._2, s"rare ${m(1L)._2} must beat unseen ${m(2L)._2}")
      assert(m(0L)._1 == 4L && m(1L)._1 == 3L)
    } finally out.unpersist()
    // self-perplexity (lm eq corpus) reuses the persisted token pass and
    // still returns one row per doc
    val self = Sampling.unigramNll(corpus, corpus)
    try assert(self.count() == 5L) finally self.unpersist()
    intercept[IllegalArgumentException](Sampling.unigramNll(corpus, lm, buckets = 1))
  }

  test("dsirWeights and unigramNll match an independent in-memory reference on a seeded random corpus") {
    import spark.implicits._
    // independent reference: java.util.regex tokenization, MessageDigest
    // md5 bucketing, scala.math log/rounding — none of the Column machinery
    val md = java.security.MessageDigest.getInstance("MD5")
    def toks(s: String): Seq[String] =
      if (s == null) Nil
      else "[A-Za-z0-9]+".r.findAllIn(s).map(_.toLowerCase).toSeq
    def bkt(t: String): Long = {
      val hex = md.digest(t.getBytes("UTF-8")).take(4)
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 256
    }
    // Spark round() is HALF_UP (away from zero), NOT math.round (half-even
    // toward +inf for negatives)
    def halfUp(x: Double): Long =
      (if (x >= 0) math.floor(x + 0.5) else math.ceil(x - 0.5)).toLong
    val rnd = new scala.util.Random(20260820L)
    val vocab = Vector.tabulate(40)(i => s"w${rnd.nextInt(10000)}x$i")
    val docsSeq = (0L until 120L).map { i =>
      val n = rnd.nextInt(30)
      val body =
        if (i == 7L) null.asInstanceOf[String]
        else if (i == 11L) ""
        else Seq.fill(n)(vocab(rnd.nextInt(vocab.length))).mkString(" ")
      (i, body)
    }
    val df = docsSeq.toDF("doc_id", "text").repartition(5)
    val targetIds = docsSeq.map(_._1).filter(_ % 3 == 0).toSet
    val target = df.filter(org.apache.spark.sql.functions.col("doc_id") % 3 === 0)

    val perDoc = docsSeq.map { case (i, s) =>
      i -> toks(s).map(bkt).groupBy(identity).view.mapValues(_.size.toLong).toMap
    }.toMap
    def totals(ids: Iterable[Long]): (Map[Long, Long], Long) = {
      val m = ids.flatMap(perDoc(_).toSeq).groupBy(_._1)
        .view.mapValues(_.map(_._2).sum).toMap
      (m, m.values.sum)
    }
    val (rcm, tr) = totals(docsSeq.map(_._1))
    val (tcm, tt) = totals(docsSeq.map(_._1).filter(targetIds))

    // dsirWeights reference
    val lrRef = rcm.keys.map { b =>
      b -> halfUp(1e6 * (math.log((tcm.getOrElse(b, 0L) + 1.0) / (tt + 256.0))
                       - math.log((rcm(b) + 1.0) / (tr + 256.0))))
    }.toMap
    val expectedW = docsSeq.map { case (i, _) =>
      val cs = perDoc(i)
      i -> (cs.values.sum, cs.map { case (b, c) => c * lrRef(b) }.sum)
    }.toMap
    val w = Sampling.dsirWeights(df, target)
    try {
      val got = w.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == expectedW)
    } finally w.unpersist()

    // unigramNll reference (lm = target corpus: exercises unseen buckets)
    val nllRef = rcm.keys.map { b =>
      b -> halfUp(1e6 * -math.log((tcm.getOrElse(b, 0L) + 1.0) / (tt + 256.0)))
    }.toMap
    val expectedN = docsSeq.map { case (i, _) =>
      val cs = perDoc(i)
      val n = cs.values.sum
      val s = cs.map { case (b, c) => c * nllRef(b) }.sum
      i -> (n, if (n == 0) 0L else math.floor(s.toDouble / n.toDouble).toLong)
    }.toMap
    val nll = Sampling.unigramNll(df, target)
    try {
      val got = nll.collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(got == expectedN)
    } finally nll.unpersist()
  }

  test("unigramNll: materialize=false is plan-only (no jobs), broadcast LM join, no Window") {
    import spark.implicits._
    val corpus = Seq((0L, "a b"), (1L, "c d")).toDF("doc_id", "text")
    val before = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val plan = Sampling.unigramNll(corpus, corpus, materialize = false)
    val after = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "materialize=false must not run any Spark job")
    val s = plan.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(!s.contains("Window"), s)
    assert(s.contains("BroadcastHashJoin"), s)
    assert(plan.count() == 2L) // the lazy plan still executes correctly
  }
}
