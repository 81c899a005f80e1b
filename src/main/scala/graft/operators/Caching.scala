package graft.operators

import org.apache.spark.sql.DataFrame

/** Scoped caching for operators whose plan references an intermediate
  * more than once (signature tables, token streams, pair tables).
  *
  * A bare `.cache()` inside a query function pins executor memory until
  * an explicit `unpersist` that the function has no natural place to
  * issue — its result is returned lazily, so the cache must outlive the
  * call (r6 ADVICE #3). `scoped` closes that hole: the intermediates are
  * cached only while the (small, aggregate-shaped) result is eagerly
  * materialized via `localCheckpoint`, then released. Checkpoint blocks,
  * unlike CacheManager entries, are reclaimed by the ContextCleaner once
  * the result is unreferenced, so nothing stays pinned across a
  * many-query session even without `spark.catalog.clearCache()`.
  */
object Caching {
  def scoped(intermediates: DataFrame*)(body: => DataFrame): DataFrame = {
    intermediates.foreach(_.cache())
    try body.localCheckpoint(eager = true)
    finally intermediates.foreach(_.unpersist(blocking = false))
  }
}
