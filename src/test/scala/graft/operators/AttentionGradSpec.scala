package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Finite-difference gradcheck for [[Attention.attentionGradQ]] — the
  * gradient differential test the reference runs through torch's autograd
  * (core.py:67-115 `check_equality`: `(y*mock).sum().backward()` then
  * compares grads): with loss L(Q) = Σ_m g_m · out_m(Q), the analytic
  * dQ must match the central difference (L(Q + εe_mf) − L(Q − εe_mf))/2ε
  * coordinate by coordinate. */
class AttentionGradSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val M = 4
  private val N = 7
  private val F = 5
  private val D = 3

  // deterministic, non-degenerate fixture (values spread so softmax
  // weights are neither uniform nor one-hot)
  private def qv(m: Int): Array[Double] =
    Array.tabulate(F)(f => math.sin(m * 3 + f * 0.7) * 0.8)
  private val kvRows = (0 until N).map { n =>
    (n.toLong, Array.tabulate(F)(f => math.cos(n * 2 + f * 0.5) * 0.9),
      Array.tabulate(D)(d => math.sin(n + d * 1.3)))
  }
  private val gRows = (0 until M).map { m =>
    (m.toLong, Array.tabulate(D)(d => math.cos(m * 1.7 + d) * 0.6))
  }

  private def qDf(perturb: Option[(Int, Int, Double)]): DataFrame =
    (0 until M).map { m =>
      val v = qv(m)
      perturb.foreach { case (pm, pf, eps) => if (pm == m) v(pf) += eps }
      (m.toLong, v)
    }.toDF("q_id", "qvec")

  private def kvDf(kPert: Option[(Int, Int, Double)] = None,
                   vPert: Option[(Int, Int, Double)] = None): DataFrame =
    kvRows.map { case (n, k, v) =>
      val kk = k.clone(); val vv = v.clone()
      kPert.foreach { case (pn, pf, e) => if (pn == n) kk(pf) += e }
      vPert.foreach { case (pn, pd, e) => if (pn == n) vv(pd) += e }
      (n, kk, vv)
    }.toDF("k_id", "kvec", "vvec")

  private val gDf = gRows.toDF("q_id", "gvec")

  private def loss(qPert: Option[(Int, Int, Double)] = None,
                   kPert: Option[(Int, Int, Double)] = None,
                   vPert: Option[(Int, Int, Double)] = None): Double =
    Attention.attention(qDf(qPert), kvDf(kPert, vPert))
      .join(gDf, "q_id")
      .select(sum(graft.functions.VecOps.dot(col("gvec"), col("out"))).as("l"))
      .head().getDouble(0)

  test("analytic dQ matches the central finite difference") {
    val dq = Attention.attentionGradQ(qDf(None), kvDf(), gDf)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    assert(dq.size == M)
    val eps = 1e-6
    for (m <- 0 until M; f <- Seq(0, 2, F - 1)) {
      val num = (loss(qPert = Some((m, f, eps))) -
        loss(qPert = Some((m, f, -eps)))) / (2 * eps)
      val ana = dq(m.toLong)(f)
      assert(math.abs(num - ana) < 1e-6,
        s"dQ[$m][$f]: analytic $ana vs numeric $num")
    }
  }

  test("analytic dK and dV match the central finite difference") {
    val rows = Attention.attentionGradKV(qDf(None), kvDf(), gDf)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Double](1).toArray, r.getSeq[Double](2).toArray)).toMap
    assert(rows.size == N)
    val eps = 1e-6
    for (n <- Seq(0, 3, N - 1); f <- Seq(0, F - 1)) {
      val num = (loss(kPert = Some((n, f, eps))) -
        loss(kPert = Some((n, f, -eps)))) / (2 * eps)
      assert(math.abs(num - rows(n.toLong)._1(f)) < 1e-6,
        s"dK[$n][$f]: analytic ${rows(n.toLong)._1(f)} vs numeric $num")
    }
    for (n <- Seq(0, 3, N - 1); d <- Seq(0, D - 1)) {
      val num = (loss(vPert = Some((n, d, eps))) -
        loss(vPert = Some((n, d, -eps)))) / (2 * eps)
      assert(math.abs(num - rows(n.toLong)._2(d)) < 1e-6,
        s"dV[$n][$d]: analytic ${rows(n.toLong)._2(d)} vs numeric $num")
    }
  }
}
