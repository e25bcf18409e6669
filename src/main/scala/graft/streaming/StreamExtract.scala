package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.model.{ExtractedPage, Page}

/** Structured Streaming surface — the analogue of the reference's always-on
  * HTTP server mode (/root/reference/src/bin/server/server.rs:97-178): pages
  * arrive continuously, each is extracted by the same per-row kernel, results
  * stream to the output table. The batch and streaming paths share the exact
  * same Extractor, so correctness properties (byte identity, graceful
  * degradation) carry over verbatim.
  *
  * Scale notes: the map is narrow (no state, no shuffle), so micro-batch
  * throughput equals batch throughput; watermarked windowed counters give the
  * per-interval ingest metrics the reference logs per request
  * (/root/reference/src/bin/server/server.rs:118-124) without a driver-side
  * bottleneck.
  */
object StreamExtract {

  /** Streaming-safe transform: identical semantics to ExtractJob.run but with
    * no repartition (salting is a batch concern; streaming micro-batches are
    * already bounded). Works on both batch and streaming Datasets. */
  def extractStream(pages: Dataset[Page]): Dataset[ExtractedPage] = {
    import pages.sparkSession.implicits._
    pages.mapPartitions(_.map(graft.Extractor.extract))
  }

  /** Watermarked per-interval ingest metrics: pages, bytes, errors per
    * 1-minute event-time window per lang. */
  def ingestMetrics(extracted: Dataset[ExtractedPage]) =
    extracted
      .withWatermark("warc_ts", "2 minutes")
      .groupBy(window(col("warc_ts"), "1 minute"), col("lang"))
      .agg(
        count(lit(1)).as("pages"),
        sum(col("htmlBytes")).as("bytes_in"),
        sum(when(col("error") =!= "", 1L).otherwise(0L)).as("errors"))

  /** Streaming exact-dedup with custom keyed state
    * (`KeyValueGroupedDataset.flatMapGroupsWithState`): the first page per
    * content hash passes, later arrivals are dropped — the always-on
    * pipeline's dedup stage. State per key is one boolean, keyed on the
    * SHA-256 of the extracted text: unlike the oracle-checkable md5 batch
    * key convention (TextOps.md5Key), this state key faces ADVERSARIAL
    * crawled content, and chosen-prefix md5 collisions are practical — a
    * collision pair would silently drop a distinct document as a
    * duplicate. Pass `stateTtl = Some("1 hour")` for a
    * processing-time TTL that bounds state at scale (tune to the crawl
    * revisit horizon); None keeps state for the query lifetime. */
  def dedupStream(extracted: Dataset[ExtractedPage],
      stateTtl: Option[String] = None): Dataset[ExtractedPage] = {
    import extracted.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val timeoutConf =
      if (stateTtl.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    extracted
      .groupByKey { p =>
        // error rows and empty extractions are NOT content duplicates of each
        // other — key them by url so each passes through exactly once;
        // real content keys on the SHA-256 of the text
        if (p.error.nonEmpty || p.text == null || p.text.isEmpty) "u:" + p.url
        else {
          // per-thread digest: getInstance is a JCA provider-registry lookup
          // plus an allocation — too heavy to pay once per record on the
          // streaming hot path
          val md = Sha256.get(); md.reset()
          "t:" + java.util.Base64.getEncoder.encodeToString(
            md.digest(p.text.getBytes(java.nio.charset.StandardCharsets.UTF_8)))
        }
      }
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(
        (_: String, rows: Iterator[ExtractedPage], state: GroupState[Boolean]) => {
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // materialized: the input iterator is only valid during this
            // call, the returned one is consumed after it
            val out =
              if (state.exists) Vector.empty[ExtractedPage]
              else rows.take(1).toVector // first arrival for this content wins
            state.update(true)
            stateTtl.foreach(state.setTimeoutDuration)
            out.iterator
          }
        })
  }

  /** File-stream main: watch `inDir` for Page parquet, extract, append to
    * `outDir` with exactly-once checkpointing.
    * runMain graft.streaming.StreamExtract <inDir> <outDir> <checkpointDir>
    */
  private val Sha256 = ThreadLocal.withInitial[java.security.MessageDigest](() =>
    java.security.MessageDigest.getInstance("SHA-256"))

  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: StreamExtract <inDir> <outDir> <checkpointDir>")
      sys.exit(2)
    }
    val Array(inDir, outDir, ckpt) = args.take(3)
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .appName("graft-stream-extract")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val pageSchema = implicitly[org.apache.spark.sql.Encoder[Page]].schema
    val pages = spark.readStream.schema(pageSchema).parquet(inDir).as[Page]
    val q = extractStream(pages)
      .drop("spans") // parquet sink demo keeps scalar columns
      .writeStream
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .format("parquet")
      .start(outDir)
    q.awaitTermination()
    spark.stop()
  }
}
