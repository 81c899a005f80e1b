package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, sum, xxhash64}

import graft.operators.PairPlan

/** Dev harness for the `kernel_ratio` investigation (VERDICT r12 #4):
  * times one modal kernel through the Blocked tile grid vs the Broadcast
  * stream — the same pair [[graft.Bench]] medians at suite end — and
  * optionally prints both executed plans, so a ratio drift can be
  * localized without a 30-minute full bench run.
  *
  * Usage: runMain graft.tools.KernelRatioProfile <sfDir> <kernel...> [plans]
  */
object KernelRatioProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val showPlans = args.contains("plans")
    val kernels = args.drop(1).filter(_ != "plans")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.Scratch.tuneLocalFs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.shuffle.sort.bypassMergeThreshold", "2")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "262144")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def force(df: DataFrame): Unit = {
      val h = xxhash64(df.columns.map(col).toIndexedSeq: _*)
      df.select(h.cast("double").as("h")).agg(sum(col("h"))).collect(); ()
    }
    def median5(f: => Unit): Double = {
      f; f // warmup
      (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.sorted.apply(2)
    }
    kernels.foreach { kernel =>
      val fn = graft.queries.MatrixQueries.modalKernels(kernel)
      if (showPlans) {
        println(s"== $kernel BLOCKED plan ==")
        fn(spark, sfDir, PairPlan.Blocked).explain("formatted")
        println(s"== $kernel BROADCAST plan ==")
        fn(spark, sfDir, PairPlan.Broadcast).explain("formatted")
      }
      val bl = median5(force(fn(spark, sfDir, PairPlan.Blocked)))
      val br = median5(force(fn(spark, sfDir, PairPlan.Broadcast)))
      println(f"KERNEL $kernel blocked=$bl%.3f broadcast=$br%.3f " +
        f"ratio=${bl / math.max(br, 1e-9)}%.3f")
    }
    spark.stop()
  }
}
