package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Behavioral tests for the funnel operator: sequencing must be strict
  * (a later step only counts AFTER the previous step's first time). */
class FunnelSpec extends AnyFunSuite {

  private val spark = TestSpark.spark
  import spark.implicits._

  private def ev(rows: (Long, String, Long)*) =
    rows.toSeq.toDF("user_id", "event_type", "ts_s")
      .withColumn("ts", col("ts_s").cast("timestamp"))

  private val steps = Seq("view", "click", "purchase")

  test("strict ordering: out-of-order and missing steps stop the funnel") {
    val events = ev(
      (1L, "view", 100L), (1L, "click", 200L), (1L, "purchase", 300L),
      // purchase BEFORE the first view must not count
      (2L, "purchase", 50L), (2L, "view", 100L), (2L, "click", 200L),
      // click with no view reaches stage 0
      (3L, "click", 100L),
      // purchase between view and click must not count; the later one does
      (4L, "view", 100L), (4L, "purchase", 150L), (4L, "click", 200L),
      (4L, "purchase", 250L))
    val got = Funnel.funnel(events, steps).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(1L) == (3L, 100L, 200L, 300L))
    assert(got(2L) == (2L, 100L, 200L, -1L), "early purchase ignored")
    assert(got(3L) == (0L, -1L, -1L, -1L), "no view -> stage 0")
    assert(got(4L) == (3L, 100L, 200L, 250L), "mid-funnel purchase ignored")
  }
}
