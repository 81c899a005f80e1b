package graft.operators

import org.apache.spark.network.util.JavaUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** The shared distribution switch for every pair-scoring kernel (attention,
  * mlp, relu_matmul, xentropy, entropy, sampler, cosine top-k): all of them
  * stream the large axis against every row of a bounded "query" side, so
  * they share one decision — ship the query side to every partition
  * (broadcast) or tile both sides (the reference's 2-D chunk grid,
  * gemm_map_reduce_attention.cpp:97-124).
  *
  *  - [[Broadcast]]: `crossJoin(broadcast(small))` — zero shuffle of the
  *    big side; only valid while the query side fits an executor.
  *  - [[Blocked]]: `SHUFFLE_REPLICATE_NL` forces `CartesianProductExec`,
  *    whose (small-partition × big-partition) task grid is the 2-D tile
  *    loop — each task streams one tile pair and partial aggregation
  *    reduces it before the only shuffle. The large-M path.
  *  - [[Auto]] (default): picks at plan time from Catalyst's size estimate
  *    of the query side vs `spark.sql.autoBroadcastJoinThreshold` — the
  *    same signal AQE uses for join strategy, so a dims-sized side
  *    broadcasts and a table-sized side tiles without the caller choosing.
  */
object PairPlan {

  sealed trait Mode
  case object Broadcast extends Mode
  case object Blocked extends Mode
  case object Auto extends Mode

  /** Pair every row of the streaming `big` side with every row of the
    * bounded `small` side under the given distribution mode. */
  def cross(big: DataFrame, small: DataFrame, mode: Mode = Auto): DataFrame =
    mode match {
      case Broadcast => big.crossJoin(broadcast(small))
      case Blocked   => big.crossJoin(small.hint("SHUFFLE_REPLICATE_NL"))
      case Auto =>
        if (fitsBroadcast(small)) cross(big, small, Broadcast)
        else cross(big, small, Blocked)
    }

  /** Catalyst's plan-time size estimate vs the session's broadcast
    * threshold ("-1" disables broadcasting entirely, as for joins). */
  def fitsBroadcast(small: DataFrame): Boolean = {
    val raw = small.sparkSession.conf
      .get("spark.sql.autoBroadcastJoinThreshold", "10MB").trim
    // JavaUtils rejects negative byte strings; "-1"/"0" mean "never broadcast"
    val threshold =
      if (raw.startsWith("-")) -1L else JavaUtils.byteStringAsBytes(raw)
    threshold > 0 &&
      small.queryExecution.optimizedPlan.stats.sizeInBytes <= threshold
  }
}
