package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.ops.Packing

/** Planted-truth tests for concatenate-and-chunk sequence packing. */
class PackingSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-packing-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getAs[Long]("doc_id") ->
      ((r.getAs[Long]("n_tok"), r.getAs[Long]("seq_id"),
        r.getAs[Long]("seq_off"), r.getAs[Long]("n_seqs")))).toMap

  test("packing places docs by running token count, budget 4") {
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val docs = Seq(
      (0L, "a b c"),        // 3 tok: start 0  -> seq 0 off 0, ends tok 2, 1 seq
      (1L, "d e"),          // 2 tok: start 3  -> seq 0 off 3, ends tok 4 -> spans 2
      (2L, "f g h i"),      // 4 tok: start 5  -> seq 1 off 1, ends tok 8 -> spans 2
      (3L, ""),             // 0 tok: start 9  -> seq 2 off 1, spans 0
      (4L, "j")             // 1 tok: start 9  -> seq 2 off 1, spans 1
    ).toDF("doc_id", "text")
      // null text packs as 0 tokens, same as empty
      .union(Seq((5L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val m = rows(Packing.packSequences(docs, budget = 4))
    assert(m(0L) == ((3L, 0L, 0L, 1L)))
    assert(m(1L) == ((2L, 0L, 3L, 2L)))
    assert(m(2L) == ((4L, 1L, 1L, 2L)))
    assert(m(3L) == ((0L, 2L, 1L, 0L)))
    assert(m(4L) == ((1L, 2L, 1L, 1L)))
    assert(m(5L) == ((0L, 2L, 2L, 0L)))
  }

  test("duplicate ids fail fast instead of packing nondeterministically") {
    import spark.implicits._
    val dup = Seq((0L, "a b"), (1L, "c"), (1L, "d e f"), (2L, "g"))
      .toDF("doc_id", "text").repartition(3)
    val e = intercept[IllegalArgumentException] {
      Packing.packSequences(dup, budget = 4).collect()
    }
    assert(e.getMessage.contains("unique"))
  }

  test("prefix sum is partitioning-invariant (two-phase scan correctness)") {
    import spark.implicits._
    // ids deliberately inserted out of order and spread over many input
    // partitions: the range sort + broadcast offsets must reconstruct the
    // exact global concatenation order
    val texts = (0L until 200L).map(i => (i, ("w " * ((i % 7) + 1).toInt).trim))
    val shuffled = new scala.util.Random(7).shuffle(texts)
    val one = rows(Packing.packSequences(
      spark.createDataFrame(shuffled).toDF("doc_id", "text").coalesce(1), 16))
    val many = rows(Packing.packSequences(
      spark.createDataFrame(shuffled).toDF("doc_id", "text").repartition(7), 16))
    assert(one == many)
    // global invariant: starts are the exclusive prefix sum in id order
    var cum = 0L
    (0L until 200L).foreach { i =>
      val (n, seqId, seqOff, _) = many(i)
      assert(seqId == cum / 16 && seqOff == cum % 16, s"doc $i")
      cum += n
    }
  }
}
