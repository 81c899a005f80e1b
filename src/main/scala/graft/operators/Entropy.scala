package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{GraftAggs, VecOps}

/** Shannon entropy of each row of `softmax(pred·trgᵀ)` (reference
  * entropy.py:5-12,18-41): `H_m = logsumexp_n(logit) − E_softmax[logit]`.
  *
  * The reference's monoid `(p = logsumexp, n = mass-weighted mean logit)`
  * (entropy.py:18-23) is the scalar (D=1) case of the attention monoid —
  * we reuse [[graft.functions.LogWeightedVecAgg]] with the logit itself
  * as the 1-element value vector, exactly as SURVEY.md §2.2 predicted one
  * Aggregator covers both ops.
  */
object Entropy {

  /** pred: (m_id, mvec); trg: (k_id, kvec). Returns (m_id, h). */
  def entropy(pred: DataFrame, trg: DataFrame,
              mode: PairPlan.Mode = PairPlan.Auto): DataFrame = {
    val sc = VecOps.dot(col("mvec"), col("kvec"))
    PairPlan.cross(trg, pred, mode)
      .select(col("m_id"), sc.as("sc"))
      .groupBy("m_id")
      .agg(GraftAggs.logWeightedVec(col("sc"), array(col("sc"))).as("lw"))
      .select(col("m_id"), (col("lw.z") - col("lw.v").getItem(0)).as("h"))
  }
}
