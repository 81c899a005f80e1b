package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, sum, xxhash64}

/** Per-round benchmark: runs every query in [[SparkEntry.benchQueries]] on
  * `SPARK_GRAFT_SF_DIR` and prints one JSON line.
  *
  * Protocol mirrors the reference's `check_speed` (reference
  * core.py:118-131: warmup then repeated timed runs): 1 warmup + 2 timed
  * runs per query, reporting the min — so JVM/JIT/Spark cold-start is not
  * attributed to the first query measured.
  *
  * The sink is a hash-sum over ALL output columns (`sum(xxhash64(cols))`),
  * so Catalyst cannot prune the projection the way the round-1 `.count()`
  * sink allowed (VERDICT.md "What's wrong" #1 — map-only queries were
  * optimized to a bare row count).
  */
object Bench {

  private def force(df: DataFrame): Unit = {
    // cast to double before summing: ANSI mode (Spark 4 default) would throw
    // on long overflow of summed hashes
    val h = xxhash64(df.columns.map(col).toIndexedSeq: _*)
    df.select(h.cast("double").as("h")).agg(sum(col("h"))).collect()
    ()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.benchQueries.map { name =>
      val fn = SparkEntry.queries(name)
      val best =
        try {
          force(fn(spark, sfDir)) // warmup (also triggers codegen + JIT)
          (1 to 2).map { _ =>
            val t0 = System.nanoTime()
            force(fn(spark, sfDir))
            (System.nanoTime() - t0) / 1e9
          }.min
        } catch { case _: Throwable => -1.0 }
      name -> best
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
