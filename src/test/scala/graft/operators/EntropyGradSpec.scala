package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Finite-difference gradcheck for [[Entropy.entropyGrad]] — the adjoint
  * the reference STUBS (entropy.py:14-16 raises NotImplementedError), so
  * unlike the attention/MLP/xentropy gradchecks there is no torch autograd
  * to anchor against: the central difference of the forward fold is the
  * only independent referee. Loss L(P) = Σ_m g_m · H_m(P); the analytic
  * dPred must match (L(P + εe_mf) − L(P − εe_mf))/2ε per coordinate. */
class EntropyGradSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val M = 4
  private val N = 7
  private val F = 5

  private def mv(m: Int): Array[Double] =
    Array.tabulate(F)(f => math.sin(m * 3 + f * 0.7) * 0.8)
  private val kvRows = (0 until N).map { n =>
    (n.toLong, Array.tabulate(F)(f => math.cos(n * 2 + f * 0.5) * 0.9))
  }
  private val gRows =
    (0 until M).map(m => (m.toLong, math.cos(m * 1.7) * 0.6))

  private def predDf(perturb: Option[(Int, Int, Double)]): DataFrame =
    (0 until M).map { m =>
      val v = mv(m)
      perturb.foreach { case (pm, pf, eps) => if (pm == m) v(pf) += eps }
      (m.toLong, v)
    }.toDF("m_id", "mvec")

  private val trgDf = kvRows.toDF("k_id", "kvec")
  private val gDf = gRows.toDF("m_id", "gm")

  private def loss(pert: Option[(Int, Int, Double)] = None): Double =
    Entropy.entropy(predDf(pert), trgDf)
      .join(gDf, "m_id")
      .select(sum(col("gm") * col("h")).as("l"))
      .head().getDouble(0)

  test("analytic dPred matches the central finite difference") {
    val dm = Entropy.entropyGrad(predDf(None), trgDf, gDf)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(dm.size == M)
    val eps = 1e-6
    for (m <- 0 until M; f <- Seq(0, 2, F - 1)) {
      val num = (loss(Some((m, f, eps))) - loss(Some((m, f, -eps)))) /
        (2 * eps)
      val ana = dm(m.toLong)(f)
      assert(math.abs(num - ana) < 1e-6,
        s"dPred[$m][$f]: analytic $ana vs numeric $num")
    }
  }

  test("zero upstream gradient zeroes the adjoint exactly") {
    val z = (0 until M).map(m => (m.toLong, 0.0)).toDF("m_id", "gm")
    val dm = Entropy.entropyGrad(predDf(None), trgDf, z).collect()
    assert(dm.length == M)
    dm.foreach { r =>
      assert(r.getSeq[Double](1).forall(_ == 0.0), s"nonzero at $r")
    }
  }
}
