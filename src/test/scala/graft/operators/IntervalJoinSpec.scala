package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.sources.Tables

/** The binned interval join must be (a) row-for-row equal to the naive
  * inequality join and (b) planned as an equi-join — no
  * BroadcastNestedLoopJoin / CartesianProduct anywhere, which is the whole
  * point of the bin rewrite.
  */
class IntervalJoinSpec extends AnyFunSuite {

  private val spark = TestSpark.spark

  private def sides() = {
    val base = Tables.events(spark, "/root/testdata/sf0.001")
      .select(col("event_id"), col("user_id").as("key"),
        unix_timestamp(col("ts")).as("t"), col("event_type"))
    val intervals = base.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("key"),
        col("t").as("t0"), (col("t") + 3600L).as("t1"))
    val points = base.filter(col("event_type") === "view")
      .select(col("key"), col("t"), col("event_id").as("v_id"))
    (intervals, points)
  }

  test("binned join == naive inequality join, pair for pair") {
    val (intervals, points) = sides()
    val binned = IntervalJoin.join(intervals, points, 3600L)
      .select(col("p_id"), col("v_id"))
    val naive = intervals.as("i").join(points.as("p"),
        col("i.key") === col("p.key") &&
          col("p.t") >= col("i.t0") && col("p.t") < col("i.t1"))
      .select(col("p_id"), col("v_id"))
    assert(binned.count() > 0, "fixture produced no qualifying pairs")
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty)
  }

  test("an interval is never paired with the same point twice") {
    val (intervals, points) = sides()
    val dup = IntervalJoin.join(intervals, points, 3600L)
      .groupBy(col("p_id"), col("v_id")).agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).count()
    assert(dup == 0)
  }

  test("plan is an equi-join: no nested loop, no cartesian") {
    val (intervals, points) = sides()
    val plan = IntervalJoin.join(intervals, points, 3600L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
  }
}
