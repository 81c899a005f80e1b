package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{GraftAggs, VecOps}

/** Per-row cross-entropy of logits `pred·trgᵀ` against an integer label
  * (reference xentropy.py:5-13,39-64): `loss_m = logsumexp_n(logit_mn) −
  * logit_m[label_m]`.
  *
  * The reference's monoid state `(p = logsumexp partial, n = Σ logit ·
  * 1[label == tix])` (xentropy.py:10-13) maps to two aggregates over the
  * same pair stream: our streaming [[graft.functions.LogSumExpAgg]] and a
  * built-in `sum(when(...))` — the indicator-mask-multiply pattern of
  * xentropy.py:12 expressed as a conditional sum. Both are commutative
  * monoids, so Catalyst's partial/final split reproduces the reference's
  * chunked fold exactly.
  */
object XEntropy {

  /** pred: (m_id, mvec, label); trg: (k_id, kvec) where k_id is the global
    * class index (reference tixs, xentropy.py:75). Returns (m_id, loss). */
  def xentropy(pred: DataFrame, trg: DataFrame,
               mode: PairPlan.Mode = PairPlan.Auto): DataFrame = {
    val sc = VecOps.dot(col("mvec"), col("kvec"))
    PairPlan.cross(trg, pred, mode)
      .select(col("m_id"), col("label"), col("k_id"), sc.as("sc"))
      .groupBy("m_id")
      .agg(
        GraftAggs.logSumExp(col("sc")).as("p"),
        sum(when(col("k_id") === col("label"), col("sc")).otherwise(0.0)).as("n"))
      .select(col("m_id"), (col("p") - col("n")).as("loss"))
  }
}
