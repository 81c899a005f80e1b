package graft

import org.apache.spark.sql.SparkSession

/** One shared local session for the whole suite (Spark startup ~5 s; suites
  * must not stop() it). Mirrors the Verify/Bench session config. */
object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "4")
      // let AQE coalesce INSIDE cached plans (off by default): without it a
      // cached tiny table materializes all 32 configured shuffle partitions
      // and every downstream stage pays 32-64 per-task fixed costs -- measured
      // 2.3x of dedup_clusters' warm process CPU. Values are unchanged; at
      // scale AQE still targets its normal partition sizes.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
