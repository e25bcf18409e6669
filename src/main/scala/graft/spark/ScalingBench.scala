package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Two-cluster-size scaling evidence (north rule: throughput scaling
  * efficiency >= 0.8 going from N to 4N executors; sandbox proxy per the
  * driver instruction: the same job unchanged at local[8] vs local[32] on the
  * same input).
  *
  * Protocol: one shared JVM; JIT warmed up once before any measurement so the
  * first-measured parallelism is not penalized; each level measured
  * `iters` times, best (min wall) kept — the steady-state number a cluster
  * would see. Prints one JSON line with pages/s, MB/s and the efficiency
  * quotient (T_n/T_4n)/(4n/n).
  *
  * `runMain graft.spark.ScalingBench [nPages] [iters]`
  */
object ScalingBench {

  final case class Run(cores: Int, secs: Double, pages: Long, bytes: Long) {
    def pagesPerSec: Double = pages / secs
    def mbPerSec: Double = bytes / 1e6 / secs
  }

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** One full pipeline pass: generate -> extract -> aggregate (the aggregate
    * forces every row through the kernel and keeps nothing in memory). */
  private def pass(spark: SparkSession, n: Long, parts: Int): (Long, Long) = {
    import spark.implicits._
    val pages = spark.range(0, n, 1, parts).as[Long]
      .mapPartitions(_.map(i => graft.fixtures.FixtureGen.fixture(i).page))
    val out = ExtractJob.run(pages)
    val row = out.agg(
      count(lit(1)), sum("htmlBytes"),
      sum(when(col("error") =!= "", 1L).otherwise(0L))).collect()(0)
    require(row.getLong(2) == 0L, s"extraction errors: ${row.getLong(2)}")
    (row.getLong(0), row.getLong(1))
  }

  def measure(cores: Int, n: Long, iters: Int): Run = {
    val spark = session(cores)
    try {
      var best = Double.MaxValue
      var pages = 0L
      var bytes = 0L
      for (_ <- 0 until iters) {
        val t0 = System.nanoTime()
        val (p, b) = pass(spark, n, parts = cores * 4)
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt < best) { best = dt; pages = p; bytes = b }
      }
      Run(cores, best, pages, bytes)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toLongOption).getOrElse(20000L)
    val iters = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(2)

    // global JIT warmup (small corpus, high parallelism), discarded
    val w = session(32)
    try pass(w, 2000, 32) finally w.stop()

    val lo = measure(8, n, iters)
    val hi = measure(32, n, iters)
    val speedup = lo.secs / hi.secs
    val efficiency = speedup / (hi.cores.toDouble / lo.cores)
    println(
      f"""{"bench":"scaling","n_pages":$n,"html_mb":${lo.bytes / 1e6}%.1f,""" +
      f""""cores_lo":${lo.cores},"secs_lo":${lo.secs}%.2f,"pages_per_sec_lo":${lo.pagesPerSec}%.0f,"mb_per_sec_lo":${lo.mbPerSec}%.1f,""" +
      f""""cores_hi":${hi.cores},"secs_hi":${hi.secs}%.2f,"pages_per_sec_hi":${hi.pagesPerSec}%.0f,"mb_per_sec_hi":${hi.mbPerSec}%.1f,""" +
      f""""speedup":$speedup%.2f,"efficiency":$efficiency%.3f}""")
  }
}
