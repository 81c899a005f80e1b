package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Does dedup_clusters' per-run process CPU reach a warm floor? (Separates
  * per-run codegen/JIT churn from steady-state work.) */
object CcRepeat {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.sources.Scratch.tuneLocalFs(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val docs = Tables.documents(spark, sfDir)
    for (i <- 1 to 6) {
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      Dedup.dedupClusters(docs).count()
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (osBean.getProcessCpuTime - c0) / 1e9
      spark.catalog.clearCache()
      println(f"[ccrep] run $i wall=$wall%6.2f cpu=$cpu%6.2f")
    }
    spark.stop()
  }
}
