package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Funnel-relevant event (epoch-second timestamps, already filtered to the
  * step types — the filter runs BEFORE the state shuffle so non-funnel
  * events never reach the state store). */
case class FunEvent(user_id: Long, event_type: String, ts_s: Long,
                    event_id: Long)

/** Per-user funnel progress carried between micro-batches: `ts(k)` is the
  * first second step k completed, -1 while unreached. Fixed size (one Long
  * per funnel step) — state volume is O(active users), never O(events). */
case class FunnelProg(ts: Seq[Long])

/** One user's current funnel position (Update semantics: re-emitted every
  * micro-batch that advances or touches the user; the sink upserts). */
case class FunnelProgOut(user_id: Long, stage: Long, ts: Seq[Long])

/** The conversion funnel ([[graft.operators.Funnel]]) as a LIVE streaming
  * state machine — `flatMapGroupsWithState` carrying each user's furthest
  * stage and step times between micro-batches.
  *
  * The batch dual defines t(k) = min event time of step k STRICTLY after
  * t(k-1). Its online form is the greedy scan: process events in event-time
  * order and let the first step-k event after t(k-1) latch t(k) — latched
  * slots never move, so the state is a fixed Long per step. Greedy == the
  * min-window chain whenever events arrive in event-time order; within a
  * micro-batch arrival order is free (the group sorts by (ts_s, event_id)),
  * across micro-batches time-ordered arrival is the documented source
  * contract (file streams land roughly in time order; the parity spec
  * splits the fixture at the median event time — the realistic outage —
  * and proves the resumed machine matches the batch plan exactly).
  *
  * State lifecycle: funnel state is per-user-lifetime by the batch dual's
  * definition (no conversion horizon), so no timeout is registered here. A
  * 100 TB deployment bounds it the standard way — define the funnel over a
  * conversion window (t1 + horizon), register an EventTimeTimeout at that
  * horizon and emit the final stage when it fires; the state store then
  * holds only users inside their conversion window, exactly like
  * [[Sessionize]]'s gap horizon.
  */
object FunnelStream {

  def funnel(ds: Dataset[FunEvent], steps: Seq[String])(
      implicit spark: SparkSession): Dataset[FunnelProgOut] = {
    import spark.implicits._
    require(steps.nonEmpty && steps.distinct == steps)
    val empty = Vector.fill(steps.length)(-1L)
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProg, FunnelProgOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[FunEvent], state: GroupState[FunnelProg]) =>
          val ts = state.getOption.map(_.ts.toVector).getOrElse(empty)
            .toArray
          val sorted = events.toSeq.sortBy(e => (e.ts_s, e.event_id))
          for (e <- sorted; k <- steps.indices) {
            // latch step k at the first step-k event strictly after t(k-1)
            if (ts(k) < 0L && e.event_type == steps(k) &&
              (k == 0 || (ts(k - 1) >= 0L && e.ts_s > ts(k - 1))))
              ts(k) = e.ts_s
          }
          state.update(FunnelProg(ts.toVector))
          Iterator(FunnelProgOut(user, ts.count(_ >= 0L).toLong, ts.toVector))
      }
  }
}
