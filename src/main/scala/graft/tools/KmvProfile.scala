package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.{GraftAggs, VecOps}
import graft.operators.{Dedup, TextOps}
import graft.sources.Tables

/** Throwaway profiler for the KMV query family's CPU split (round 10):
  * times each sub-plan of shingle_kmv / docs_kmv_stream separately so the
  * optimization lands where the time actually is. */
object KmvProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.sources.Scratch.tuneLocalFs(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Int, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.add((si.stageId, si.name.takeWhile(_ != '\n').take(60),
          m.executorCpuTime / 1000000, si.numTasks, m.executorRunTime))
      }
    })
    def dumpStages(tag: String): Unit = {
      import scala.jdk.CollectionConverters._
      val xs = stages.asScala.toVector
      stages.clear()
      val tot = xs.map(_._3).sum
      println(f"[kmvprof] --- $tag: ${xs.size} stages, sum executorCpu=${tot / 1000.0}%.2f s")
      xs.sortBy(-_._3).take(14).foreach { case (id, nm, cpuMs, nt, runMs) =>
        println(f"[kmvprof]   stage $id%4d cpu=${cpuMs / 1000.0}%7.2f run=${runMs / 1000.0}%7.2f tasks=$nt%3d  $nm")
      }
    }
    def time(name: String)(f: => Long): Unit = {
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      val n = f
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (osBean.getProcessCpuTime - c0) / 1e9
      println(f"[kmvprof] $name%-28s wall=$wall%7.2f cpu=$cpu%7.2f rows=$n")
    }

    val docs = Tables.documents(spark, sfDir)
    val K = 256
    def shingleHashes = docs.select(col("lang"),
        explode(Dedup.shingles(TextOps.tokens(col("text")))).as("sh"))
      .select(col("lang"), VecOps.hash60(col("sh")).as("h"))

    // warmup
    shingleHashes.groupBy(col("lang"))
      .agg(GraftAggs.kmvSketch(K)(col("h"))).count()

    time("scan+tokens only")(
      docs.select(size(TextOps.tokens(col("text"))).as("n"))
        .agg(sum(col("n"))).collect()(0).getLong(0))
    time("explode shingles")(
      docs.select(explode(Dedup.shingles(TextOps.tokens(col("text"))))
        .as("sh")).count())
    time("explode+hash60 count")(
      shingleHashes.agg(sum(col("h") % 2)).collect()(0).getLong(0))
    time("kmvSketch agg only")(
      shingleHashes.groupBy(col("lang"))
        .agg(GraftAggs.kmvSketch(K)(col("h"))).count())
    time("countDistinct only")(
      shingleHashes.groupBy(col("lang"))
        .agg(countDistinct(col("h"))).count())
    time("distinct() then agg")(
      shingleHashes.distinct().groupBy(col("lang"))
        .agg(count(lit(1))).count())
    time("shingle_kmv e2e")(
      graft.SparkEntry.queries("shingle_kmv")(spark, sfDir).count())
    stages.clear()
    time("shingle_kmv_jaccard e2e")(
      graft.SparkEntry.queries("shingle_kmv_jaccard")(spark, sfDir).count())
    dumpStages("shingle_kmv_jaccard")
    stages.clear()
    time("shingle_kmv_jaccard 2nd")(
      graft.SparkEntry.queries("shingle_kmv_jaccard")(spark, sfDir).count())
    dumpStages("shingle_kmv_jaccard 2nd")
    time("docs_kmv_stream e2e")(
      graft.SparkEntry.queries("docs_kmv_stream")(spark, sfDir).count())
    spark.stop()
  }
}
