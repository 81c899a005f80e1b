package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{GraftAggs, VecOps}

/** Exact categorical sampling from `softmax(pred·trgᵀ)` per row without
  * materializing the logit matrix (reference sampling.py:5-61).
  *
  * The reference merges chunk candidates with probability `e^{z_a −
  * logaddexp(z_a, z_b)}` (sampling.py:25-30) — biased per SURVEY.md §2.4.3.
  * We implement the exact, associative form instead: the Gumbel-max trick
  * as a pure max monoid — `argmax_n(logit_n + Gumbel_n)` is an unbiased
  * softmax sample, and `max` over perturbed keys is trivially commutative/
  * associative, so Spark's partial/final agg needs no custom state at all
  * (`max(struct(perturbed, logit, idx))`).
  *
  * Noise is a deterministic Gumbel stream keyed on (seed, m_id, k_id)
  * rather than the reference's `torch.rand` (sampling.py:5,14) —
  * reproducible across retries AND bit-identically computable by the
  * DuckDB oracle, so this normally "nondeterministic" operator gets a
  * full hash-equality check. The stream is the codegen'd integer
  * [[graft.functions.Mix60Kernel]] ([[VecOps.pairGumbel]]): noise is
  * evaluated once per (m, k) PAIR, and the md5-string stream it replaced
  * was ~90% of sampler_big's CPU (VERDICT r6 plan audit).
  *
  * Output matches gemmmr_sampler (sampling.py:59-61): the chosen global
  * index `c` and its softmax probability `weight = e^{z − logsumexp}`.
  */
object Sampler {

  /** pred: (m_id, mvec); trg: (k_id, kvec). Returns (m_id, c, weight). */
  def sampler(pred: DataFrame, trg: DataFrame, seed: String,
              mode: PairPlan.Mode = PairPlan.Auto): DataFrame = {
    val sc = VecOps.dot(col("mvec"), col("kvec"))
    val noise = VecOps.pairGumbel(VecOps.seed60(seed), col("m_id"), col("k_id"))
    PairPlan.cross(trg, pred, mode)
      .select(col("m_id"), col("k_id"), sc.as("sc"))
      .select(col("m_id"), col("k_id"), col("sc"),
        (col("sc") + noise).as("pert"))
      .groupBy("m_id")
      .agg(
        max(struct(col("pert"), col("sc"), col("k_id"))).as("top"),
        GraftAggs.logSumExp(col("sc")).as("tz"))
      .select(col("m_id"), col("top.k_id").as("c"),
        exp(col("top.sc") - col("tz")).as("weight"))
  }
}
