package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import graft.ops.Dedup

/** Planted-truth tests for connected components over dedup pair lists. */
class ComponentsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .appName("graft-components-spec")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private def run(nodeIds: Seq[Long], edges: Seq[(Long, Long)]) = {
    import spark.implicits._
    val out = Dedup.connectedComponents(
      nodeIds.toDF("doc_id"), edges.toDF("doc_a", "doc_b"))
    val m = out.collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("component"), r.getAs[Int]("is_keeper")))).toMap
    out.unpersist()
    m
  }

  test("path component plus singleton") {
    spark.sparkContext.setLogLevel("WARN")
    val m = run(Seq(0L, 1L, 2L, 3L, 4L), Seq((0L, 1L), (1L, 2L), (2L, 3L)))
    assert(Seq(0L, 1L, 2L, 3L).forall(i => m(i)._1 == 0L))
    assert(m(0L)._2 == 1 && m(1L)._2 == 0)
    assert(m(4L) == ((4L, 1)))
  }

  test("two components with out-of-order, self, and duplicate edges") {
    val m = run(Seq(2L, 3L, 5L, 7L, 9L),
      Seq((5L, 9L), (9L, 2L), (7L, 3L), (9L, 5L), (7L, 7L)))
    assert(m(2L) == ((2L, 1)) && m(5L) == ((2L, 0)) && m(9L) == ((2L, 0)))
    assert(m(3L) == ((3L, 1)) && m(7L) == ((3L, 0)))
  }

  test("long path converges (pointer jumping beats O(diameter))") {
    val n = 64L
    val m = run(0L until n, (0L until n - 1).map(i => (i, i + 1)))
    assert((0L until n).forall(i => m(i)._1 == 0L))
  }

  test("edges touching ids absent from nodes are ignored") {
    val m = run(Seq(0L, 1L), Seq((1L, 999L)))
    assert(m(0L) == ((0L, 1)) && m(1L) == ((1L, 1)))
  }

  test("duplicate node ids in the seed do not fan out the propagation") {
    spark.sparkContext.setLogLevel("WARN")
    // id 1 appears twice: without the seed distinct() every pointer-jump
    // join would multiply its rows each round (and skew the Σlbl witness)
    val m = run(Seq(0L, 1L, 1L, 2L), Seq((0L, 1L), (1L, 2L)))
    assert(m.size == 3)
    assert(Seq(0L, 1L, 2L).forall(i => m(i)._1 == 0L))
    assert(m(0L)._2 == 1 && m(1L)._2 == 0 && m(2L)._2 == 0)
  }

  test("no edges: every node is its own keeper") {
    val m = run(Seq(10L, 20L), Seq.empty)
    assert(m(10L) == ((10L, 1)) && m(20L) == ((20L, 1)))
  }
}
