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
    // single-pass contract: ONE extraction+write job per run — lineage
    // counters ride the write job in an accumulator, so there is no second
    // stats scan of the output (nor the old per-group input re-scans)
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
    assert(jobCount.get() <= 2, s"expected a single-pass run (<=2 Spark jobs), saw ${jobCount.get()}")
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

  test("manifest json round-trips") {
    val m = TableIO.UnitManifest(7, "abc123", 10, 9, 1, 12345L, 999L, 1700000000000L)
    assert(TableIO.parseManifest(TableIO.renderManifest(m)) == m)
  }
}
