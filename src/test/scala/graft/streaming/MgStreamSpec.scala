package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Pins the claims [[StreamingOps.mgStream]]'s scaladoc makes about the
  * streamed Misra–Gries fold: the state respects its m-entry budget, the
  * compress step genuinely decrements on this fixture (m < vocabulary —
  * the state is a real sketch, not exact counts), and the mergeable-
  * summaries error theorem est ≤ tf ∧ tf − est ≤ n/(m+1) holds for EVERY
  * token under ANY batch slicing — including an at-least-once replay,
  * which MG (unlike KMV's semilattice) absorbs only into the theorem's
  * slack, never past it. */
class MgStreamSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def snapshot(statePath: String): Map[String, Long] =
    spark.read.parquet(statePath).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap

  test("batched MG fold keeps the m-entry budget, really decrements, and " +
       "the merged-summary error bound holds for every token") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val statePath =
      graft.sources.Scratch.dir("graft_mg_spec_state") + "/state"
    val b = Seq(0, 1, 2).map(i => docs.filter(col("doc_id") % 3 === i))
    b.zipWithIndex.foreach { case (batch, id) =>
      StreamingOps.mgFoldBatch(batch, id.toLong, statePath) }
    val st = snapshot(statePath)
    assert(st.nonEmpty && st.size <= StreamingOps.MgStreamM,
      s"state size ${st.size} exceeds m=${StreamingOps.MgStreamM}")

    // exact counts recomputed from scratch
    val exact = docs.select(
        explode(graft.operators.TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("tf"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    // the sketch regime is real: fewer state entries than vocabulary,
    // and at least one estimate strictly below its exact count
    assert(st.size < exact.size, "m >= vocab: the compress never fired")
    assert(exact.exists { case (t, tf) => st.getOrElse(t, 0L) < tf },
      "no decrement happened — not a sketch")
    // the theorem, for EVERY token (absent from state => estimate 0)
    exact.foreach { case (t, tf) =>
      val est = st.getOrElse(t, 0L)
      assert(est <= tf, s"overestimate on $t: $est > $tf")
      assert((tf - est).toDouble <= n.toDouble / (StreamingOps.MgStreamM + 1),
        s"bound broken on $t: $tf - $est > $n/${StreamingOps.MgStreamM + 1}")
    }

    // an at-least-once replay is a NO-OP: the state carries the applied
    // batch id, so a failure-retry with batchId ≤ applied skips the fold
    // instead of re-adding the batch's counts (ADVICE r12 #2 — the
    // double-count could push est past tf and flip stream_ok)
    StreamingOps.mgFoldBatch(b(1), 1L, statePath)
    assert(snapshot(statePath) == st,
      "replayed batch mutated the state — the applied-batch-id guard is gone")
  }
}
