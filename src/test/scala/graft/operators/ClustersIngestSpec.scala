package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** Incremental cluster maintenance ([[Dedup.clustersIngest]] /
  * [[Dedup.mergeLabels]]): the affected-subgraph CC must reproduce the
  * from-scratch clustering of the union EXACTLY — merged clusters adopt
  * the true union minimum, untouched clusters do not move, batch-only
  * clusters appear, and previously-isolated existing docs that gain
  * their first edge are emitted.
  */
class ClustersIngestSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private def labels(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("mergeLabels: bridge doc merges two old clusters to the union min") {
    val old = Seq((10L, 10L), (12L, 10L), (20L, 20L), (22L, 20L))
      .toDF("doc_id", "label")
    val edges = Seq((5L, 12L), (5L, 22L)).toDF("doc_a", "doc_b")
    val got = labels(Dedup.mergeLabels(old, edges))
    assert(got == Set((10L, 5L), (12L, 5L), (20L, 5L), (22L, 5L), (5L, 5L)))
  }

  test("mergeLabels: untouched clusters keep their label; batch-only and " +
    "first-edge nodes appear") {
    val old = Seq((10L, 10L), (12L, 10L), (30L, 30L), (32L, 30L))
      .toDF("doc_id", "label")
    val edges = Seq(
      (11L, 12L),  // batch doc joins cluster 10
      (41L, 43L),  // batch-only cluster
      (50L, 51L)   // previously-isolated existing 50 + batch 51
    ).toDF("doc_a", "doc_b")
    val got = labels(Dedup.mergeLabels(old, edges))
    assert(got == Set(
      (10L, 10L), (12L, 10L), (11L, 10L),
      (30L, 30L), (32L, 30L),
      (41L, 41L), (43L, 41L),
      (50L, 50L), (51L, 50L)))
  }

  test("mergeLabels: chain of batch docs merges three old clusters") {
    val old = Seq((10L, 10L), (20L, 20L), (30L, 30L), (12L, 10L),
      (22L, 20L), (32L, 30L)).toDF("doc_id", "label")
    // 7-12, 7-9, 9-22, 9-32: one new component spanning all three clusters
    val edges = Seq((7L, 12L), (7L, 9L), (9L, 22L), (9L, 32L))
      .toDF("doc_a", "doc_b")
    val got = labels(Dedup.mergeLabels(old, edges))
    val members = Set(10L, 12L, 20L, 22L, 30L, 32L, 7L, 9L)
    assert(got == members.map(m => (m, 7L)))
  }

  test("clustersIngest merge phase feeds the existing side from the " +
    "persisted state files") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Dedup.clustersIngest(
      d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1))
      .queryExecution.executedPlan.toString
    // the existing corpus rides in as parquet state (sig/bnd/labels), and
    // every batch-side minhash subtree is materialized before the merge —
    // the merge plan itself re-shingles NOTHING
    assert(plan.contains("graft_ingest_state"))
    assert(!plan.contains("graft_minhash"))
  }

  test("clustersIngest == from-scratch union clustering on the fixture") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val inc = labels(Dedup.clustersIngest(
      d.filter(col("doc_id") % 2 === 0), d.filter(col("doc_id") % 2 === 1)))
    val scratch = labels(Dedup.connectedComponents(
      Dedup.minhashPairs(d).filter(col("est_jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"))))
    assert(inc == scratch)
  }
}
