package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Similarity.mmrTopK]] — greedy Maximal Marginal Relevance on a
  * hand-checkable fixture: the seed is pure-relevance argmax, and at step
  * 2 a LESS relevant but diverse candidate must beat a more relevant
  * near-duplicate of the seed — the reranker's whole point.
  *
  * Hand arithmetic (integer ten-thousandths, λ = 7/10 ⇒ score = 7r − 3m):
  * q = (1,1,0,0)-direction; a = (1,.2,0,0) r≈8321; b = (1,.1,0,0)
  * r≈7740, sim(a,b)≈9952 (near-dup of a); c = (.05,1,0,0) r≈7415 < r(b),
  * sim(a,c)≈2448. Step 2: score(b) = 7·7740 − 3·9952 ≈ 24324 <
  * score(c) = 7·7415 − 3·2448 ≈ 44561 — c wins by thousands of grid
  * units, far above any last-ulp quantization wobble.
  */
class MmrSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  test("diverse candidate beats a more-relevant near-duplicate at step 2") {
    val q = Seq((100L, Array(1.0, 1.0, 0.0, 0.0))).toDF("q_id", "qvec")
    val kv = Seq(
      (1L, Array(1.0, 0.2, 0.0, 0.0)),  // a: most relevant
      (2L, Array(1.0, 0.1, 0.0, 0.0)),  // b: near-dup of a, rel #2
      (3L, Array(0.05, 1.0, 0.0, 0.0))  // c: diverse, rel #3
    ).toDF("k_id", "kvec")
    val out = Similarity.mmrTopK(q, kv, k = 3, sel = 3).collect()
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    // pure-relevance order would be a, b, c; MMR order is a, c, b
    assert(out.toSeq == Seq((1L, 1L), (2L, 3L), (3L, 2L)))
  }

  test("tripletMine: a weak anchor never emits its positive as a negative") {
    // the rank-1 cosine (8944 tm) sits INSIDE the negative band (≤ 9000):
    // before the ADVICE r10 fix the positive paired with itself as a
    // margin-0 "hard negative" at neg_rank 1 and shifted every real rank
    val q = Seq((100L, Array(1.0, 0.0, 0.0, 0.0))).toDF("q_id", "qvec")
    val kv = Seq(
      (1L, Array(1.0, 0.5, 0.0, 0.0)), // positive: cos_tm 8944
      (2L, Array(1.0, 1.0, 0.0, 0.0)), // cos_tm 7071
      (3L, Array(0.0, 1.0, 0.0, 0.0))  // cos_tm 0
    ).toDF("k_id", "kvec")
    val rows = Similarity.tripletMine(q, kv, negK = 5, negHiTm = 9000L).collect()
    assert(rows.map(_.getAs[Long]("neg_id")).sorted.toSeq == Seq(2L, 3L))
    rows.foreach { r =>
      assert(r.getAs[Long]("pos_id") == 1L)
      assert(r.getAs[Long]("neg_id") != r.getAs[Long]("pos_id"),
        s"degenerate triplet: $r")
      assert(r.getAs[Long]("margin_tm") > 0, s"non-positive margin: $r")
    }
    // ranks stay dense 1..n after excluding the positive from the band
    assert(rows.map(_.getAs[Long]("neg_rank")).sorted.toSeq ==
      (1L to rows.length).toSeq)
  }

  test("marginal score is non-increasing from step 2 onward") {
    // (step 1 -> 2 is only comparable when pairwise sims are nonnegative:
    // a negative max-sim makes the -3m penalty a bonus)
    val q = Seq((100L, Array(1.0, 0.5, 0.25, 0.0))).toDF("q_id", "qvec")
    val kv = (1L to 8L).map(i =>
      (i, Array(1.0 / i, 0.5 + 0.1 * i, 0.25 * (i % 3), 0.1 * i)))
      .toDF("k_id", "kvec")
    val rows = Similarity.mmrTopK(q, kv, k = 6, sel = 4).collect()
      .map(r => (r.getLong(1), r.getLong(4))).sortBy(_._1)
    val scores = rows.map(_._2).drop(1)
    assert(scores.zip(scores.tail).forall { case (x, y) => x >= y },
      s"scores not monotone: ${scores.toSeq}")
  }
}
