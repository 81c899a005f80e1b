package graft.operators

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark.spark

/** The property content-defined chunking exists for: one insertion near a
  * document's head must perturb only the chunk it lands in — every later
  * boundary re-synchronizes on content, so the shared tail still matches
  * chunk-for-chunk. Fixed-width chunking loses every fingerprint after
  * the edit. */
class CdcChunkSpec extends AnyFunSuite {

  import spark.implicits._

  // 300 varied tokens (deterministic), then the same doc with one token
  // inserted at position 5
  private val toks = (0 until 300).map(i => s"w${(i * 2654435761L) % 997}")
  private val original = toks.mkString(" ")
  private val edited = (toks.take(5) ++ Seq("INSERTED") ++ toks.drop(5))
    .mkString(" ")
  private def docs = Seq((1L, original), (2L, edited)).toDF("doc_id", "text")

  private def hashesOf(df: org.apache.spark.sql.DataFrame, id: Long) =
    df.filter($"doc_id" === id).select("chunk_hash").as[Long].collect().toSet

  test("CDC chunks re-synchronize after an insertion; fixed-width don't") {
    val cdc = TextOps.chunkCdc(docs).cache()
    val c1 = hashesOf(cdc, 1L)
    val c2 = hashesOf(cdc, 2L)
    val nChunks = c1.size
    assert(nChunks >= 4, s"fixture should split into several chunks, got $nChunks")
    // everything after the boundary following the edit is shared: at most
    // the edited chunk (plus a possible boundary-straddle) differs
    assert((c1 & c2).size >= nChunks - 2,
      s"CDC tail should re-sync: |c1|=$nChunks shared=${(c1 & c2).size}")
    cdc.unpersist()

    val fixed = TextOps.chunk(docs).cache()
    val f1 = hashesOf(fixed, 1L)
    val f2 = hashesOf(fixed, 2L)
    // the 1-token shift moves every window: nothing survives
    assert((f1 & f2).isEmpty,
      s"fixed-width should lose every fingerprint, shared=${(f1 & f2).size}")
    fixed.unpersist()
    ()
  }

  test("chunk ids are dense and coverage is exact") {
    val cdc = TextOps.chunkCdc(docs)
    val per = cdc.groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.sum("tok_n").as("n"),
        org.apache.spark.sql.functions.countDistinct("cid").as("k"),
        org.apache.spark.sql.functions.max("cid").as("mx"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(per(1L)._1 === 300L) // every token in exactly one chunk
    assert(per(2L)._1 === 301L)
    assert(per(1L)._2 === per(1L)._3 + 1) // cids 0..max dense
  }
}
