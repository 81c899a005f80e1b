package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** Dedup-state retraction ([[Dedup.clustersRetract]] /
  * [[Dedup.retractLabels]]): removing a doc batch from the persisted
  * cluster labels must reproduce from-scratch clustering of corpus∖batch
  * EXACTLY — a removed LABEL forces re-election of the min survivor, a
  * removed BRIDGE splits one component into several, an entirely-removed
  * cluster vanishes, and untouched clusters do not move.
  */
class ClustersRetractSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private def labels(df: DataFrame): Set[(Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  /** edgesAmong for a fixed synthetic edge list: keep edges with BOTH
    * endpoints in the given survivor set (what recomputation over the
    * affected survivors produces, minus the removed-endpoint edges). */
  private def among(edges: Seq[(Long, Long)])(surv: DataFrame): DataFrame = {
    val e = edges.toDF("doc_a", "doc_b")
    e.join(surv.select(col("doc_id").as("doc_a")), "doc_a")
      .join(surv.select(col("doc_id").as("doc_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"))
  }

  test("retractLabels: removing the label re-elects the min survivor") {
    // cluster {1,2,3} labeled 1 via edges 1-2, 2-3; remove 1 → {2,3} label 2
    val old = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("doc_id", "label")
    val edges = Seq((1L, 2L), (2L, 3L))
    val got = labels(Dedup.retractLabels(old, Seq(1L).toDF("doc_id"), among(edges)))
    assert(got == Set((2L, 2L), (3L, 2L)))
  }

  test("retractLabels: removing a bridge splits the component") {
    // chain 1-2-3-4-5 labeled 1; remove 3 → {1,2} label 1 and {4,5} label 4
    val old = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (5L, 1L))
      .toDF("doc_id", "label")
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val got = labels(Dedup.retractLabels(old, Seq(3L).toDF("doc_id"), among(edges)))
    assert(got == Set((1L, 1L), (2L, 1L), (4L, 4L), (5L, 4L)))
  }

  test("retractLabels: whole-cluster removal vanishes; edge-less survivor " +
    "drops; untouched clusters keep labels") {
    val old = Seq(
      (10L, 10L), (11L, 10L),             // untouched
      (20L, 20L), (21L, 20L),             // fully removed
      (30L, 30L), (31L, 30L), (32L, 30L)  // 30,31 removed → 32 edge-less
    ).toDF("doc_id", "label")
    val edges = Seq((10L, 11L), (20L, 21L), (30L, 31L), (31L, 32L))
    val got = labels(Dedup.retractLabels(
      old, Seq(20L, 21L, 30L, 31L).toDF("doc_id"), among(edges)))
    assert(got == Set((10L, 10L), (11L, 10L)))
  }

  test("clustersRetract == from-scratch clustering of corpus∖batch on the fixture") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val keep = d.filter(col("doc_id") % Dedup.RetractMod =!= 0)
    val ret = labels(Dedup.clustersRetract(
      d, d.filter(col("doc_id") % Dedup.RetractMod === 0)))
    val scratch = labels(Dedup.connectedComponents(
      Dedup.minhashPairs(keep).filter(col("est_jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"))))
    assert(ret == scratch)
  }

  test("clustersRetract retraction phase feeds from the persisted state " +
    "files, never re-deriving the corpus side") {
    val d = Tables.documents(spark, "/root/testdata/sf0.001")
    val plan = Dedup.clustersRetract(
      d, d.filter(col("doc_id") % Dedup.RetractMod === 0))
      .queryExecution.executedPlan.toString
    // the graded plan reads the scratch state parquet (sig/bnd/labels) and
    // must NOT re-shingle the corpus: the minhash kernel appears nowhere
    assert(plan.contains("graft_retract_state"))
    assert(!plan.contains("graft_minhash"))
  }
}
