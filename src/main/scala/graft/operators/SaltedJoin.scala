package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-safe shuffle equi-join — the "salting" pattern for hot keys.
  *
  * When BOTH join sides are too big to broadcast and a few keys dominate,
  * a plain shuffle join serializes every hot-key row through one task (the
  * partition that owns the key). Salting restores parallelism:
  *
  *  - big side: `__salt = hash(tag) % r` — deterministic per row, spreads
  *    each key's rows over r sub-partitions;
  *  - small side: replicated r× (explode over 0..r−1), so every
  *    (key, salt) combination finds its match;
  *  - join on (key, __salt), salt dropped after.
  *
  * The salt is join-neutral, so the result is row-for-row identical to the
  * plain join (proved in SaltedJoinSpec and graded end-to-end in
  * `events_salted_join`). Cost: an r× replication of the small side —
  * choose r ≈ hot-key cardinality / target task rows. AQE's skew-join
  * split is the automatic alternative when the runtime can split one side;
  * explicit salting also covers the shapes AQE's splitter declines (e.g.
  * full-outer, or salting an aggregation key), and composes with bucketed
  * layouts where AQE cannot re-plan.
  */
object SaltedJoin {

  /** `big ⋈ small` on `keys`, with the big side salted by `hash(tag) % r`.
    * `tag` is any stable per-row column of the big side (a row id is
    * ideal); rows with equal tags share a salt, which is harmless — any
    * salt value joins correctly. */
  def join(big: DataFrame, small: DataFrame, keys: Seq[String],
           tag: Column, r: Int): DataFrame = {
    require(r > 0, "salt fan-out must be positive")
    val b = big.withColumn("__salt", pmod(xxhash64(tag), lit(r.toLong)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit((r - 1).toLong))))
    b.join(s, keys :+ "__salt").drop("__salt")
  }
}
