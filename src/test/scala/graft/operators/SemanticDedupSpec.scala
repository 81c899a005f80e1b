package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** [[Similarity.semanticDedup]] — the SemDeDup recipe on a hand-checkable
  * fixture: duplicate components form WITHIN a Voronoi cell, exactly one
  * member per component survives, the survivor is the farthest-from-
  * centroid member (lowest quantized centroid-cosine, id tie-break),
  * singletons are not emitted, and a near-dup pair straddling a cell
  * boundary is unseen — the recall trade the paper makes explicit.
  */
class SemanticDedupSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val tau = 0.9

  test("within-cell dup components; farthest-from-centroid survives") {
    // cell 0 (label 0, near e0): 1 ~ 2 are dups (cos .995), 3 is a
    // singleton; cell 1 (label 1, near e2): 4 ~ 5 are dups (cos .949)
    val emb = Seq(
      (1L, Array(1.0, 0.0, 0.0, 0.0), 0),
      (2L, Array(0.98, 0.1, 0.0, 0.0), 0),
      (3L, Array(0.7, 0.7, 0.0, 0.0), 0),
      (4L, Array(0.0, 0.0, 1.0, 0.0), 1),
      (5L, Array(0.0, 0.0, 0.9, 0.3), 1)
    ).toDF("vec_id", "vec", "label")
    val out = Similarity.semanticDedup(emb, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(4)))
      .toSet
    // comp = component-min id; keeper 1 has qc ≈ .958 < 2's .982, keeper
    // 5 has qc ≈ .986 < 4's .988 (hand-computed against the label-mean
    // centroids, margins far above the 4-decimal quantization)
    assert(out == Set(
      (1L, 1L, 0L, true), (2L, 1L, 0L, false),
      (4L, 4L, 1L, false), (5L, 4L, 1L, true)))
  }

  test("exactly one survivor per component, and it minimizes (qc, id)") {
    val emb = Seq(
      (1L, Array(1.0, 0.0, 0.0, 0.0), 0),
      (2L, Array(0.98, 0.1, 0.0, 0.0), 0),
      (6L, Array(0.99, 0.05, 0.0, 0.0), 0),
      (4L, Array(0.0, 0.0, 1.0, 0.0), 1),
      (5L, Array(0.0, 0.0, 0.9, 0.3), 1)
    ).toDF("vec_id", "vec", "label")
    val rows = Similarity.semanticDedup(emb, tau).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3), r.getBoolean(4)))
    val byComp = rows.groupBy(_._2)
    assert(byComp.values.forall(_.count(_._4) == 1))
    byComp.values.foreach { ms =>
      val kept = ms.find(_._4).get
      val best = ms.minBy(m => (m._3, m._1))
      assert(kept._1 == best._1)
    }
  }

  test("cross-cell near-dups are unseen (the cell-boundary recall trade)") {
    // 11 and 21 have cos ≈ .999 but sit in DIFFERENT Voronoi cells; their
    // within-cell neighbors are below tau — so no duplicate edge exists
    val emb = Seq(
      (10L, Array(1.0, 0.0, 0.0, 0.0), 0),
      (11L, Array(0.72, 0.0, 0.69, 0.0), 0),
      (20L, Array(0.0, 0.0, 1.0, 0.0), 1),
      (21L, Array(0.69, 0.0, 0.72, 0.0), 1)
    ).toDF("vec_id", "vec", "label")
    import graft.functions.VecOps
    import org.apache.spark.sql.functions.col
    val cos = emb.as("a").join(emb.as("b"),
        col("a.vec_id") === 11L && col("b.vec_id") === 21L)
      .select(VecOps.cosine(col("a.vec"), col("b.vec")))
      .head.getDouble(0)
    assert(cos >= tau) // the pair IS a semantic dup...
    assert(Similarity.semanticDedup(emb, tau).count() == 0) // ...unseen
  }
}
