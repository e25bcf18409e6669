package graft.spark

import org.apache.spark.sql.SparkSession

/** One-off plan print for a named SparkEntry query (debug aid).
  * runMain graft.spark.PlanDebug <query> [sfDir] */
object PlanDebug {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    println(df.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode))
    spark.stop()
  }
}
