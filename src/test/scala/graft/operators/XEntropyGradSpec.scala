package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Finite-difference gradcheck for [[XEntropy.xentropyGradPred]] /
  * [[XEntropy.xentropyGradTrg]]: with loss L = Σ_m g_m · xentropy_m, the
  * analytic dPred/dTrg (softmax-minus-one-hot adjoint) must match the
  * central differences. */
class XEntropyGradSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private val M = 4
  private val N = 6
  private val F = 5

  private def mv(m: Int): Array[Double] =
    Array.tabulate(F)(f => math.sin(m * 2.1 + f * 0.8) * 0.9)
  private def kv(n: Int): Array[Double] =
    Array.tabulate(F)(f => math.cos(n * 1.4 + f * 0.5) * 0.8)
  private def label(m: Int): Long = (m * 2 + 1) % N
  private val gm = (0 until M).map(m => math.cos(m * 0.9) * 0.6)

  private def predDf(pert: Option[(Int, Int, Double)]): DataFrame =
    (0 until M).map { m =>
      val v = mv(m)
      pert.foreach { case (pm, pf, e) => if (pm == m) v(pf) += e }
      (m.toLong, v, label(m))
    }.toDF("m_id", "mvec", "label")

  private def trgDf(pert: Option[(Int, Int, Double)]): DataFrame =
    (0 until N).map { n =>
      val v = kv(n)
      pert.foreach { case (pn, pf, e) => if (pn == n) v(pf) += e }
      (n.toLong, v)
    }.toDF("k_id", "kvec")

  private val gDf = (0 until M).map(m => (m.toLong, gm(m))).toDF("m_id", "gm")

  private def loss(mPert: Option[(Int, Int, Double)] = None,
                   tPert: Option[(Int, Int, Double)] = None): Double =
    XEntropy.xentropy(predDf(mPert), trgDf(tPert))
      .collect().map(r => r.getDouble(1) * gm(r.getLong(0).toInt)).sum

  test("analytic dPred matches the central finite difference") {
    val dp = XEntropy.xentropyGradPred(predDf(None), trgDf(None), gDf)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val eps = 1e-6
    for (m <- 0 until M; f <- Seq(0, F - 1)) {
      val num = (loss(mPert = Some((m, f, eps))) -
        loss(mPert = Some((m, f, -eps)))) / (2 * eps)
      assert(math.abs(num - dp(m.toLong)(f)) < 1e-6,
        s"dPred[$m][$f]: analytic ${dp(m.toLong)(f)} vs numeric $num")
    }
  }

  test("analytic dTrg matches the central finite difference") {
    val dt = XEntropy.xentropyGradTrg(predDf(None), trgDf(None), gDf)
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val eps = 1e-6
    for (n <- Seq(0, 2, N - 1); f <- Seq(0, F - 1)) {
      val num = (loss(tPert = Some((n, f, eps))) -
        loss(tPert = Some((n, f, -eps)))) / (2 * eps)
      assert(math.abs(num - dt(n.toLong)(f)) < 1e-6,
        s"dTrg[$n][$f]: analytic ${dt(n.toLong)(f)} vs numeric $num")
    }
  }
}
