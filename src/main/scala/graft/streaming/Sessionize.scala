package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event for sessionization (epoch-second timestamps). */
case class SessEvent(user_id: Long, event_id: Long, ts_s: Long)

/** Open-session state carried between micro-batches. */
case class SessState(sessionId: Long, startS: Long, lastS: Long, n: Long)

/** One (possibly still-open) session. */
case class SessionOut(user_id: Long, session_id: Long, n_events: Long,
                      start_s: Long, end_s: Long)

/** Gap-based sessionization with `flatMapGroupsWithState` — the custom
  * per-key streaming state API (the brief's
  * mapGroupsWithState/flatMapGroupsWithState surface). A session is a run
  * of a user's events with < gapSec between consecutive events.
  *
  * Each micro-batch emits every session it advanced (closed ones finally,
  * the open one provisionally — Update semantics); the open session's state
  * persists in the state store. The batch dual is the classic
  * lag/cumsum/groupBy window-function plan (`StreamQueries.sessionsBatch`),
  * and `StreamingParitySpec` proves they agree.
  */
object Sessionize {

  val GapSec = 1800L

  def sessions(ds: Dataset[SessEvent], gapSec: Long = GapSec)(
      implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    ds.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[SessEvent], state: GroupState[SessState]) =>
          val sorted = events.toSeq.sortBy(e => (e.ts_s, e.event_id))
          var cur = state.getOption.orNull
          val out = Seq.newBuilder[SessionOut]
          for (e <- sorted) {
            if (cur == null) {
              cur = SessState(1L, e.ts_s, e.ts_s, 1L)
            } else if (e.ts_s - cur.lastS > gapSec) {
              out += SessionOut(user, cur.sessionId, cur.n, cur.startS, cur.lastS)
              cur = SessState(cur.sessionId + 1, e.ts_s, e.ts_s, 1L)
            } else {
              cur = cur.copy(lastS = e.ts_s, n = cur.n + 1)
            }
          }
          if (cur != null) {
            // provisional emit of the open session (Update semantics)
            out += SessionOut(user, cur.sessionId, cur.n, cur.startS, cur.lastS)
            state.update(cur)
          }
          out.result().iterator
      }
  }
}
