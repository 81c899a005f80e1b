package graft.operators

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

/** Pins [[SpanDedup]]'s island-merge coverage math on a corpus with known
  * shared runs (W = 12 tokens). */
class SpanDedupSpec extends AnyFunSuite {

  import spark.implicits._

  private val run = (0 until 20).map(i => s"shared$i").mkString(" ") // 20 toks
  private def uniq(tag: String, n: Int) =
    (0 until n).map(i => s"$tag$i").mkString(" ")

  test("coverage merges overlapping windows into exact token spans") {
    // doc 1: unique(10) ++ shared(20) ++ unique(10) — the shared run sits
    // at positions 10..29; stride-1 dup windows at p = 10..18 merge into
    // ONE island covering exactly the 20 shared tokens
    // doc 2: shared(20) ++ unique(30) — dup windows at p = 0..8
    // doc 3: fully unique
    val docs = Seq(
      (1L, s"${uniq("a", 10)} $run ${uniq("b", 10)}"),
      (2L, s"$run ${uniq("c", 30)}"),
      (3L, uniq("d", 40))
    ).toDF("doc_id", "text")
    val got = SpanDedup.spanCoverage(docs).collect()
      .map { case Row(id: Long, nt: Long, nw: Long, dw: Long, cov: Long,
        frac: Double, keep: Boolean) => id -> ((nt, nw, dw, cov, frac, keep))
      }.toMap
    assert(got(1L) === ((40L, 29L, 9L, 20L, 0.5, false)))
    assert(got(2L) === ((50L, 39L, 9L, 20L, 0.4, false)))
    assert(got(3L) === ((40L, 29L, 0L, 0L, 0.0, true)))
  }

  test("short docs duplicated wholesale cover their entire length") {
    // both docs shorter than W: the kernel emits ONE full-text window;
    // identical docs → dup; coverage clamps to n_tokens, frac = 1
    val docs = Seq(
      (1L, "tiny shared doc"),
      (2L, "tiny shared doc"),
      (3L, "another doc entirely")
    ).toDF("doc_id", "text")
    val got = SpanDedup.spanCoverage(docs).collect()
      .map { case Row(id: Long, nt: Long, _, dw: Long, cov: Long,
        frac: Double, keep: Boolean) => id -> ((nt, dw, cov, frac, keep))
      }.toMap
    assert(got(1L) === ((3L, 1L, 3L, 1.0, false)))
    assert(got(2L) === ((3L, 1L, 3L, 1.0, false)))
    assert(got(3L) === ((3L, 0L, 0L, 0.0, true)))
  }
}
