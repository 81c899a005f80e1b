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
    assert(!p.contains("ShuffledHashJoin"))
  }

  test("broadcast arm fan-out is proportionate to the pair volume " +
      "(VERDICT r8 #2 + r9 #2)") {
    // a one-split streaming side with a LARGE estimated pair grid must not
    // run the whole pair stream (and its partial agg) in a single task...
    val big = spark.range(5000000L).toDF("k_id").coalesce(1)
    val small = spark.range(20L).toDF("q_id")
    val fanned = PairPlan.cross(big, small, PairPlan.Broadcast)
      .rdd.getNumPartitions
    assert(fanned >= math.min(spark.sparkContext.defaultParallelism, 4),
      s"broadcast arm left a ~1e8-pair grid at $fanned partition(s)")
    // ...but a TINY grid (64×8 pairs here) must stay serial: the r9
    // unconditional fan-out taxed every small kernel ~0.2 CPU-s per task
    // of pure shuffle-file + aggregation fixed cost
    val tiny = PairPlan.cross(kv.coalesce(1), q, PairPlan.Broadcast)
      .rdd.getNumPartitions
    assert(tiny == 1,
      s"broadcast arm fanned a 512-pair grid out to $tiny partitions")
  }

  test("auto tiles when broadcasting is disabled, same results") {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val p = planOf(PairPlan.Auto)
      // the tile grid is a tile-keyed ShuffledHashJoin since r13 (stays
      // inside whole-stage codegen, unlike CartesianProductExec)
      assert(p.contains("ShuffledHashJoin"), s"expected tile grid in:\n$p")
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
