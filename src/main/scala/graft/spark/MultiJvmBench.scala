package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Page

/** Multi-process scaling evidence — the closest sandbox proxy to "N vs 4N
  * executors on a cluster": each child JVM is one executor (own heap, own GC,
  * local[coresPerExec]); the same input is strong-scaled across 1 vs 4
  * executors. Unlike the single-JVM local[8]/local[32] proxy, this keeps
  * per-executor memory bandwidth and GC threads constant, which is exactly
  * what adding cluster nodes does.
  *
  * runMain graft.spark.MultiJvmBench <corpusDir> [coresPerExec] [iters]
  * Prints one JSON line with both levels + efficiency.
  */
object MultiJvmBench {

  private def childArgs(heap: String, cores: Int): Seq[String] = {
    val opens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke",
      "java.base/java.lang.reflect", "java.base/java.io",
      "java.base/java.net", "java.base/java.nio",
      "java.base/java.util", "java.base/java.util.concurrent",
      "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs",
      "java.base/sun.security.action", "java.base/sun.util.calendar"
    ).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    // ActiveProcessorCount: a real cluster executor is told its core budget;
    // without it every child sizes GC/thread pools for all 32 host CPUs and
    // the 4-fleet oversubscribes the box into the ground (load 60+ observed)
    Seq("java", s"-Xmx$heap", s"-Xms$heap", "-XX:+AlwaysPreTouch",
      s"-XX:ActiveProcessorCount=$cores",
      "-cp", System.getProperty("java.class.path")) ++ opens
  }

  /** Run `nProcs` child executors over disjoint file slices. Returns the max
    * over children of the IN-CHILD job time (session-up to job-done): on a
    * real cluster executor JVM boot is amortized over hours, and on this VM
    * four concurrent -Xms pre-touches page-fault-storm each other — boot time
    * is not what the north rule's scaling criterion measures. */
  def runFleet(dir: String, nProcs: Int, cores: Int, heap: String): Double = {
    val logs = (0 until nProcs).map(i => java.io.File.createTempFile(s"graft-exec-$i-", ".log"))
    val procs = (0 until nProcs).map { i =>
      new ProcessBuilder(
        (childArgs(heap, cores) ++ Seq("graft.spark.ExecutorSim", dir,
          i.toString, nProcs.toString, cores.toString)): _*)
        .redirectErrorStream(true)
        .redirectOutput(ProcessBuilder.Redirect.to(logs(i)))
        .start()
    }
    val codes = procs.map(_.waitFor())
    require(codes.forall(_ == 0), s"child exit codes: $codes")
    val times = logs.map { f =>
      val src = scala.io.Source.fromFile(f)
      val t = try src.getLines().collectFirst {
        case l if l.startsWith("JOBSECS ") => l.stripPrefix("JOBSECS ").toDouble
      } finally src.close()
      t.getOrElse(sys.error(s"no JOBSECS in ${f.getPath}"))
    }
    times.max
  }

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cores = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(8)
    val iters = args.drop(2).headOption.flatMap(_.toIntOption).getOrElse(2)
    val heap = sys.env.getOrElse("SPARK_EXEC_MEM", "3g")

    var t1 = Double.MaxValue
    var t4 = Double.MaxValue
    for (_ <- 0 until iters) {
      t1 = math.min(t1, runFleet(dir, 1, cores, heap))
      t4 = math.min(t4, runFleet(dir, 4, cores, heap))
    }
    val speedup = t1 / t4
    val eff = speedup / 4.0
    println(
      f"""{"bench":"multi-jvm-scaling","cores_per_exec":$cores,"execs_lo":1,"secs_lo":$t1%.2f,""" +
      f""""execs_hi":4,"secs_hi":$t4%.2f,"speedup":$speedup%.2f,"efficiency":$eff%.3f}""")
  }
}

/** One simulated executor: processes the file slice `idx mod nProcs` of the
  * corpus through the full extraction pipeline. */
object ExecutorSim {
  def main(args: Array[String]): Unit = {
    val Array(dir, idxS, nProcsS, coresS) = args.take(4)
    val (idx, nProcs, cores) = (idxS.toInt, nProcsS.toInt, coresS.toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-exec-$idx")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val listed = new java.io.File(dir).listFiles()
    require(listed != null, s"corpus dir missing or unreadable: $dir")
    val files = listed
      .filter(_.getName.endsWith(".parquet")).map(_.getPath).sorted
      .zipWithIndex.collect { case (p, i) if i % nProcs == idx => p }
    require(files.nonEmpty,
      s"executor $idx/$nProcs got an empty file slice — corpus at $dir has " +
        s"${listed.count(_.getName.endsWith(".parquet"))} parquet files; " +
        "materialize with at least one file per executor")
    def job(): (Long, Long) = {
      val pages = spark.read.parquet(files: _*).as[Page]
      val out = ExtractJob.run(pages)
      val row = out.agg(count(lit(1)), sum(when(col("error") =!= "", 1L).otherwise(0L))).collect()(0)
      (row.getLong(0), row.getLong(1))
    }
    job() // in-child warmup (JIT is per-process)
    val t0 = System.nanoTime()
    val (rows, errors) = job()
    val secs = (System.nanoTime() - t0) / 1e9
    println(s"executor $idx/$nProcs: rows=$rows errors=$errors")
    println(f"JOBSECS $secs%.3f")
    if (errors != 0L) { // name the offenders before failing — a bare
      // require(errors == 0) made a 1-in-600k corpus regression undebuggable
      val pages = spark.read.parquet(files: _*).as[Page]
      ExtractJob.run(pages).filter(col("error") =!= "")
        .select(col("url"), col("error")).collect()
        .foreach(r => println(s"BADROW ${r.getString(0)} :: ${r.getString(1)}"))
    }
    require(errors == 0L, s"$errors extraction errors (see BADROW lines)")
    spark.stop()
  }
}
