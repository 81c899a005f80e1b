package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** The two packing invariants VERDICT r5 #5 requires, asserted on the real
  * fixture: no window over capacity, every chunk assigned exactly once
  * (its rows partition its token span). */
class PackSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  private val Capacity = 128

  private def packed = {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    TextOps.pack(
      TextOps.chunk(docs).join(docs.select(col("doc_id"), col("lang")), "doc_id"),
      Capacity)
  }

  test("every window holds <= capacity tokens; all but the last per lang exactly capacity") {
    val w = packed.groupBy(col("lang"), col("window_id"))
      .agg(sum(col("n_in_window")).as("n"))
      .withColumn("is_last",
        col("window_id") === max(col("window_id"))
          .over(org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))))
    assert(w.filter(col("n") > Capacity).isEmpty, "a window exceeds capacity")
    assert(w.filter(!col("is_last") && col("n") =!= Capacity).isEmpty,
      "a non-final window is not filled to exactly capacity (split packing wastes no tokens)")
  }

  test("every chunk is assigned exactly once: rows partition its token span") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.01")
    val chunks = TextOps.chunk(docs)
    val perChunk = packed.groupBy(col("doc_id"), col("chunk_id"))
      .agg(sum(col("n_in_window")).as("covered"),
        count(lit(1)).as("parts"),
        min(col("tok_from")).as("first_from"),
        max(col("tok_from") + col("n_in_window")).as("last_to"))
      .join(chunks.select(col("doc_id"), col("chunk_id"), col("n_tokens")),
        Seq("doc_id", "chunk_id"), "full")
    // coverage: every chunk appears, with its token count fully covered by
    // contiguous parts starting at offset 0 — and nothing extra appears
    assert(perChunk.filter(
      col("covered").isNull || col("n_tokens").isNull ||
        col("covered") =!= col("n_tokens") ||
        col("first_from") =!= 0 || col("last_to") =!= col("n_tokens"))
      .isEmpty, "a chunk is missing, duplicated, or partially covered")
    // chunk width (32) << capacity ⇒ a chunk straddles at most one boundary
    assert(perChunk.filter(col("parts") > 2).isEmpty,
      "a chunk spans more than two windows")
  }
}
