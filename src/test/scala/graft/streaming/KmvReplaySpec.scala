package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Proves the claim [[StreamingOps.kmvStream]]'s scaladoc makes: the KMV
  * ingest fold needs no replay bookkeeping because the combine is a
  * SEMILATTICE — re-folding an already-absorbed micro-batch (foreachBatch's
  * at-least-once failure mode) lands on the bit-identical state, and any
  * batch slicing of the corpus folds to the same state as the one-shot
  * aggregate. The EWMA/Holt streams need a persisted batch-id guard for
  * the same scenario; KMV's protection is algebraic. */
class KmvReplaySpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def snapshot(statePath: String): Map[String, Seq[Long]] =
    spark.read.parquet(statePath).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap

  test("replaying an absorbed micro-batch leaves the state bit-identical; " +
       "any batch slicing folds to the one-shot sketch") {
    val docs = graft.sources.Tables.documents(spark, dir)
    val statePath =
      graft.sources.Scratch.dir("graft_kmv_replay_state") + "/state"
    val b = Seq(0, 1, 2).map(i => docs.filter(col("doc_id") % 3 === i))

    StreamingOps.kmvFoldBatch(b(0), statePath)
    StreamingOps.kmvFoldBatch(b(1), statePath)
    val afterTwo = snapshot(statePath)
    // the at-least-once replay: batch 1 is folded AGAIN
    StreamingOps.kmvFoldBatch(b(1), statePath)
    assert(snapshot(statePath) == afterTwo,
      "replaying batch 1 changed the state")
    StreamingOps.kmvFoldBatch(b(2), statePath)
    val streamed = snapshot(statePath)

    // one-shot aggregate over the whole corpus (a DIFFERENT fold shape)
    val oneshot = docs
      .select(col("lang"),
        explode(graft.operators.Dedup.shingles(
          graft.operators.TextOps.tokens(col("text")))).as("sh"))
      .select(col("lang"), graft.functions.VecOps.hash60(col("sh")).as("h"))
      .groupBy(col("lang"))
      .agg(graft.functions.GraftAggs
        .kmvSketch(StreamingOps.KmvStreamK)(col("h")).as("sk"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(streamed == oneshot,
      "streamed fold differs from the one-shot sketch")
  }
}
