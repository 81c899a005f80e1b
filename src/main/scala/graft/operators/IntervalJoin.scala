package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Point-in-interval join WITHOUT the range-join cartesian: both sides are
  * keyed by (key, time-bin) and equi-joined, then the exact containment
  * predicate filters inside the bin-matched pairs.
  *
  * Why this shape: Catalyst plans a bare `t BETWEEN t0 AND t1` join
  * condition as BroadcastNestedLoopJoin (or per-key cartesian) — O(P·I)
  * pair evaluations per key, the plan that dies first at 100 TB. Binning
  * turns it into a plain equi-shuffle join: an interval spanning W bins is
  * replicated W times (for fixed-width intervals W ≤ width/bin + 1, a
  * small constant chosen by `binSec`); each point lives in exactly ONE
  * bin, so every qualifying (interval, point) pair is produced exactly
  * once — no post-join dedup. The shuffle is on (key, bin): time-skew is
  * bounded by the bin width, and AQE's skew-join split handles a hot
  * (key, bin) like any other skewed equi-join — none of which applies to
  * a nested-loop plan.
  *
  * The composed-operator counterpart of [[AsOfJoin]] (carry-forward
  * semantics) for containment semantics — the other half of the temporal
  * join family.
  */
object IntervalJoin {

  /** `intervals`: (key, t0, t1, …) half-open [t0, t1); `points`:
    * (key, t, …). Returns the qualifying pairs with both sides' payload
    * columns; the caller aggregates. */
  def join(intervals: DataFrame, points: DataFrame, binSec: Long): DataFrame = {
    val ivl = intervals.withColumn("bin",
      explode(sequence(expr(s"t0 div $binSec"), expr(s"(t1 - 1) div $binSec"))))
    val pts = points.withColumn("bin", expr(s"t div $binSec"))
    ivl.join(pts, Seq("key", "bin"))
      .filter(col("t") >= col("t0") && col("t") < col("t1"))
      .drop("bin")
  }
}
