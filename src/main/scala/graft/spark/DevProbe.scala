package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.model.Page

/** Diagnostic: stage-by-stage cost breakdown of one Spark pass over the
  * materialized bench corpus — scan-only vs scan+extract vs full encode —
  * to locate overhead vs the raw kernel throughput (MicroScale).
  * runMain graft.spark.DevProbe <corpusDir> [cores]
  */
object DevProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cores = args.drop(1).headOption.flatMap(_.toIntOption).getOrElse(32)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.files.maxPartitionBytes", (8 * 1024 * 1024).toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time(label: String)(f: => Any): Unit = {
      // two runs, report both (first may carry codegen compile)
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val r = f
        println(f"$label run$i: ${(System.nanoTime() - t0) / 1e9}%6.2f s  ($r)")
      }
    }

    time("scan html bytes      ") {
      spark.read.parquet(dir).agg(sum(length(col("html")))).collect()(0).getLong(0)
    }
    time("scan+decode rows     ") {
      spark.read.parquet(dir).as[Page].mapPartitions(_.map(p => p.html.length.toLong))
        .reduce(_ + _)
    }
    time("scan+extract (no enc)") {
      val inKernel = spark.sparkContext.longAccumulator("kernelNanos")
      val r = spark.read.parquet(dir).as[Page]
        .mapPartitions(_.map { p =>
          val t0 = System.nanoTime()
          val x = graft.Extractor.extract(p).text.length.toLong
          inKernel.add(System.nanoTime() - t0)
          x
        })
        .reduce(_ + _)
      println(f"    kernel core-seconds: ${inKernel.value / 1e9}%.1f")
      r
    }
    time("full pipeline + agg  ") {
      ExtractJob.run(spark.read.parquet(dir).as[Page])
        .agg(count(lit(1)), sum(length(col("text")))).collect()(0).getLong(0)
    }
    spark.stop()
  }
}
