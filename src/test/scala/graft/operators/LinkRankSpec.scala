package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** PageRank invariants on the bipartite shipment graph: probability mass
  * conserves (the symmetric graph has no dangling leak, so Σr = 1 up to
  * the per-node 1e-9 quantization), every rank is positive and bounded by
  * the residual floor, and iterating MOVES the vector off the uniform
  * seed (the fixture graph is irregular, so one matvec already
  * differentiates hubs). */
class LinkRankSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"
  private def li = Tables.lineitem(spark, dir)

  test("rank mass conserves: sum(r) = 1 within the quantization budget") {
    val r = LinkRank.ranks(li, 3)
    val n = r.count()
    val mass = r.agg(sum(col("r"))).head().getDouble(0)
    assert(math.abs(mass - 1.0) <= n * 1e-9 + 1e-9,
      s"rank mass $mass drifted from 1.0 over $n nodes")
  }

  test("every rank is at least the residual floor and below 1") {
    val r = LinkRank.ranks(li, 2)
    val n = r.count()
    val floor = LinkRank.Residual / n - 1e-9
    assert(r.filter(col("r") < floor || col("r") >= 1.0).count() == 0)
  }

  test("iteration moves ranks off the uniform seed") {
    val r1 = LinkRank.ranks(li, 1)
    val distinctRanks = r1.select(col("r")).distinct().count()
    assert(distinctRanks > 1,
      "one iteration left every node at the same rank — graph degenerate or loop broken")
  }

  test("converged ranks: stops by criterion and equals the fixed-count chain") {
    // epsRel = 9.0 stops at round 5 on the sf0.001 fixture (movement·N
    // trace: 16.6, 14.1, 11.9, 10.2, 8.63, ...) — and the stopping round's
    // ranks must equal ranks(li, 5) exactly (same chain, same grid)
    val conv = LinkRank.ranksConverged(li, 9.0, 8)
    val iters = conv.select(col("iters")).head().getLong(0)
    assert(iters == 5L, s"criterion fired at round $iters, expected 5")
    val fixed = LinkRank.ranks(li, 5)
    val got = conv.select(col("node"), col("r"))
    assert(got.exceptAll(fixed).count() == 0 &&
      fixed.exceptAll(got).count() == 0)
  }

  test("converged ranks: a loose criterion stops immediately, a strict one runs out") {
    // movement·N starts ~16.6, so epsRel = 100 fires after round 1
    assert(LinkRank.ranksConverged(li, 100.0, 8)
      .select(col("iters")).head().getLong(0) == 1L)
    // epsRel = 0 can never fire; maxIters bounds the loop
    assert(LinkRank.ranksConverged(li, 0.0, 2)
      .select(col("iters")).head().getLong(0) == 2L)
  }

  test("edges are symmetric: each (src,dst) has its (dst,src) twin") {
    val e = LinkRank.edges(li)
    val asym = e.join(
      e.select(col("dst").as("src"), col("src").as("dst")),
      Seq("src", "dst"), "left_anti")
    assert(asym.count() == 0)
  }
}
