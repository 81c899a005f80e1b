package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** The Auto distribution switch picks broadcast for a small query side and
  * the blocked 2-D grid when broadcasting is off/oversized — and both
  * plans compute identical results (VERDICT r2 next-steps #6).
  */
class PairPlanSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private def q = (0L until 8L).map(i => (i, Array.fill(4)(i * 0.5 + 1.0)))
    .toDF("q_id", "qvec")
  private def kv = (0L until 64L)
    .map(i => (i, Array.fill(4)(1.0 / (i + 1)), Array.fill(2)(i * 1.0)))
    .toDF("k_id", "kvec", "vvec")

  private def planOf(mode: PairPlan.Mode): String =
    Attention.attention(q, kv, scale = false, mode)
      .queryExecution.executedPlan.toString

  test("auto broadcasts a dims-sized query side") {
    val p = planOf(PairPlan.Auto)
    assert(p.contains("BroadcastExchange"), s"expected broadcast in:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("broadcast arm fans out a single-split big side (VERDICT r8 #2)") {
    // a one-split streaming side must not run the whole pair stream (and
    // its partial agg) in a single task under the Broadcast arm
    val parts = PairPlan.cross(kv.coalesce(1), q, PairPlan.Broadcast)
      .rdd.getNumPartitions
    assert(parts >= spark.sparkContext.defaultParallelism,
      s"broadcast arm left the big side at $parts partition(s)")
  }

  test("auto tiles when broadcasting is disabled, same results") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val p = planOf(PairPlan.Auto)
      assert(p.contains("CartesianProduct"), s"expected tile grid in:\n$p")
      assert(!p.contains("BroadcastExchange"))
      val blocked = Attention.attention(q, kv, scale = false, PairPlan.Auto)
        .select($"q_id", $"z").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      spark.conf.set(key, old)
      val bcast = Attention.attention(q, kv, scale = false, PairPlan.Auto)
        .select($"q_id", $"z").collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(blocked.keySet == bcast.keySet)
      for ((k, v) <- blocked) assert(math.abs(v - bcast(k)) < 1e-9)
    } finally spark.conf.set(key, old)
  }
}
