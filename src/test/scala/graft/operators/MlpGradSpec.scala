package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Finite-difference gradcheck for [[Mlp.mlpGradX]]/[[Mlp.mlpGradPQ]] —
  * the gradient differential test the reference runs through torch
  * autograd (mlp.py `check`): with loss L = Σ_b g_b · out_b, the analytic
  * gx/gp/gq must match central differences coordinate by coordinate.
  * Fixture values keep every x·p dot far from the relu kink, so the
  * ±ε probes never cross it. */
class MlpGradSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val B = 3
  private val M = 4
  private val K = 5
  private val D = 3

  private def xv(b: Int): Array[Double] =
    Array.tabulate(M)(m => math.sin(b * 2 + m * 0.9) + 0.1)
  private def pv(k: Int): Array[Double] =
    Array.tabulate(M)(m => math.cos(k + m * 0.6) * 0.8)
  private def qv(k: Int): Array[Double] =
    Array.tabulate(D)(d => math.sin(k * 1.3 + d) * 0.7)
  private val gRows = (0 until B).map { b =>
    (b.toLong, Array.tabulate(D)(d => math.cos(b + d * 0.8) * 0.5))
  }
  private val gArr = gRows.map(_._2)

  private def xDf(pert: Option[(Int, Int, Double)]): DataFrame =
    (0 until B).map { b =>
      val v = xv(b)
      pert.foreach { case (pb, pm, e) => if (pb == b) v(pm) += e }
      (b.toLong, v)
    }.toDF("b_id", "xvec")

  private def pqDf(pPert: Option[(Int, Int, Double)],
                   qPert: Option[(Int, Int, Double)]): DataFrame =
    (0 until K).map { k =>
      val p = pv(k); val q = qv(k)
      pPert.foreach { case (pk, pm, e) => if (pk == k) p(pm) += e }
      qPert.foreach { case (pk, pd, e) => if (pk == k) q(pd) += e }
      (k.toLong, p, q)
    }.toDF("k_id", "pvec", "qvec")

  private val gDf = gRows.toDF("b_id", "gvec")

  private def loss(xPert: Option[(Int, Int, Double)] = None,
                   pPert: Option[(Int, Int, Double)] = None,
                   qPert: Option[(Int, Int, Double)] = None): Double =
    Mlp.mlp(xDf(xPert), pqDf(pPert, qPert))
      .collect()
      .map(r => r.getDouble(2) * gArr(r.getLong(0).toInt)(r.getLong(1).toInt))
      .sum

  test("analytic gx matches the central finite difference") {
    val gx = Mlp.mlpGradX(xDf(None), pqDf(None, None), gDf)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val eps = 1e-6
    for (b <- 0 until B; m <- Seq(0, M - 1)) {
      val num = (loss(xPert = Some((b, m, eps))) -
        loss(xPert = Some((b, m, -eps)))) / (2 * eps)
      assert(math.abs(num - gx(b.toLong)(m)) < 1e-6,
        s"gx[$b][$m]: analytic ${gx(b.toLong)(m)} vs numeric $num")
    }
  }

  test("analytic gp and gq match the central finite difference") {
    val rows = Mlp.mlpGradPQ(xDf(None), pqDf(None, None), gDf)
      .collect().map(r => r.getLong(0) ->
        (r.getSeq[Double](1).toArray, r.getSeq[Double](2).toArray)).toMap
    val eps = 1e-6
    for (k <- Seq(0, K - 1); m <- Seq(0, M - 1)) {
      val num = (loss(pPert = Some((k, m, eps))) -
        loss(pPert = Some((k, m, -eps)))) / (2 * eps)
      assert(math.abs(num - rows(k.toLong)._1(m)) < 1e-6,
        s"gp[$k][$m]: analytic ${rows(k.toLong)._1(m)} vs numeric $num")
    }
    for (k <- Seq(0, K - 1); d <- Seq(0, D - 1)) {
      val num = (loss(qPert = Some((k, d, eps))) -
        loss(qPert = Some((k, d, -eps)))) / (2 * eps)
      assert(math.abs(num - rows(k.toLong)._2(d)) < 1e-6,
        s"gq[$k][$d]: analytic ${rows(k.toLong)._2(d)} vs numeric $num")
    }
  }
}
