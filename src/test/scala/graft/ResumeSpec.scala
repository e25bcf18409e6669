package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.spark.{ExtractMain, TableIO}
import java.nio.file.Files

/** North-rule resumability gate: a killed run resumes from the last committed
  * snapshot and converges to byte-identical table contents vs a clean run. */
class ResumeSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-resume-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def contentHashes(root: String): Set[(String, String)] = {
    val paths = TableIO.committedDataPaths(root)
    if (paths.isEmpty) Set.empty
    else spark.read.parquet(paths: _*)
      .select(col("url"), sha2(to_binary(col("text"), lit("utf-8")), 256))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
  }

  test("crash after 2 groups, resume completes; contents identical to clean run") {
    spark.sparkContext.setLogLevel("WARN")
    val clean = Files.createTempDirectory("graft-clean").toString
    val crashy = Files.createTempDirectory("graft-crashy").toString
    val in = "fixture:300"
    val units = 16

    val cleanArgs = ExtractMain.Args(in = in, out = clean, units = units, groupSize = 4)
    // single-pass contract: ONE extraction+write DATA job per run — lineage
    // counters ride the write job in an accumulator, so there is no second
    // stats scan of the output (nor the old per-group input re-scans). The
    // exactly-once audit adds metadata-only jobs (parquet footer count +
    // schema read of scratch), so the budget is 4, not 2 — still zero
    // re-scans of row data on the happy path.
    val jobCount = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobCount.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      assert(ExtractMain.run(spark, cleanArgs) == units)
    } finally {
      // listener events post asynchronously; wait for the count to settle
      var last = -1
      var spins = 0
      while (jobCount.get() != last && spins < 20) {
        last = jobCount.get(); Thread.sleep(250); spins += 1
      }
      spark.sparkContext.removeSparkListener(listener)
    }
    assert(jobCount.get() <= 4, s"expected a single-pass run (<=4 Spark jobs incl. metadata audit), saw ${jobCount.get()}")
    assert(TableIO.committedUnits(clean) == (0 until units).toSet)

    val crashArgs = ExtractMain.Args(in = in, out = crashy, units = units,
      groupSize = 4, failAfterGroups = 2)
    intercept[ExtractMain.InjectedFailure] { ExtractMain.run(spark, crashArgs) }
    val afterCrash = TableIO.committedUnits(crashy)
    assert(afterCrash.size == 8, s"expected 8 committed units, got ${afterCrash.size}")

    // resume: only the pending units run; previously committed are skipped
    val resumed = ExtractMain.run(spark, crashArgs.copy(failAfterGroups = -1))
    assert(resumed == units - 8)
    assert(TableIO.committedUnits(crashy) == (0 until units).toSet)

    assert(contentHashes(crashy) == contentHashes(clean))
    assert(contentHashes(clean).size == 300)

    // lineage counters survived and total correctly
    val ms = TableIO.readManifests(crashy)
    assert(ms.map(_.rows).sum == 300)
    assert(ms.map(_.pagesErr).sum == 0)
    assert(ms.map(_.bytesIn).sum > 0)

    // idempotent: nothing pending on a third invocation
    assert(ExtractMain.run(spark, crashArgs.copy(failAfterGroups = -1)) == 0)
  }

  test("zero-row input commits empty manifests cleanly (audit must not crash on empty scratch)") {
    // a fresh run over an empty input writes only _SUCCESS to scratch; the
    // exactly-once audit's scratch count must use the explicit schema (no
    // parquet files to infer from) and the run must commit all units at 0
    val out = Files.createTempDirectory("graft-empty").toString
    val args = ExtractMain.Args(in = "fixture:0", out = out, units = 4, groupSize = 2)
    assert(ExtractMain.run(spark, args) == 4)
    assert(TableIO.committedUnits(out) == (0 until 4).toSet)
    val ms = TableIO.readManifests(out)
    assert(ms.map(_.rows).sum == 0)
    // idempotent second run: nothing pending
    assert(ExtractMain.run(spark, args) == 0)
  }

  test("manifest json round-trips") {
    val m = TableIO.UnitManifest(7, "abc123", 10, 9, 1, 12345L, 999L, 1700000000000L)
    assert(TableIO.parseManifest(TableIO.renderManifest(m)) == m)
  }

  test("readbackStats fallback computes the same per-unit lineage the accumulator would") {
    // ground-truth equivalence of the audit fallback: hand-built rows written
    // partitioned by unit, aggregated back — must match exact expectations
    // (incl. code-point char counting for non-BMP text)
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-readback").toString + "/scratch"
    val ts = new java.sql.Timestamp(0L)
    val rows = Seq(
      ("u://1", 0, "", 100L, "hello"),            // unit 0, ok, 5 chars
      ("u://2", 0, "Boom: x", 50L, ""),           // unit 0, err
      ("u://3", 1, "", 10L, "ab\uD83D\uDE00"),    // unit 1, ok, 3 code points
      ("u://4", 1, "", 40L, "xyz")                // unit 1, ok
    ).toDF("url", "unit", "error", "htmlBytes", "text")
    rows.write.partitionBy("unit").parquet(dir)
    val stats = ExtractMain.readbackStats(spark, dir)
    assert(stats(0) == ((2L, 1L, 1L, 150L, 5L)), stats(0).toString)
    assert(stats(1) == ((2L, 2L, 0L, 50L, 6L)), stats(1).toString)
  }
}
