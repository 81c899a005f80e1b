package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Label propagation must find exact components on known graph shapes —
  * including a chain, whose diameter forces multiple iterations (the case
  * a single min-join would get wrong). */
class ConnectedComponentsSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("chain + pair + star resolve to component minima") {
    // chain 1-2-3-4-5 (diameter 4), pair 10-11, star 20-{21,22,23}
    val labels = cc(Seq(
      (2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L),
      (11L, 10L),
      (20L, 21L), (20L, 22L), (23L, 20L)))
    assert(Seq(1L, 2L, 3L, 4L, 5L).forall(labels(_) == 1L), "chain collapses to min")
    assert(labels(10L) == 10L && labels(11L) == 10L)
    assert(Seq(20L, 21L, 22L, 23L).forall(labels(_) == 20L))
    assert(labels.size == 11)
  }

  test("two components never merge without an edge") {
    val labels = cc(Seq((1L, 2L), (3L, 4L)))
    assert(labels(2L) == 1L && labels(4L) == 3L)
    assert(labels(1L) != labels(3L))
  }
}
