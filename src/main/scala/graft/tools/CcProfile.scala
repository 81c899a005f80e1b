package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Throwaway profiler for the dedup_clusters CPU constant (VERDICT r5 #6):
  * times each pipeline stage separately at the given SF dir. */
object CcProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.sources.Scratch.tuneLocalFs(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
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
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]

    // stage-level ground truth: executor cpu + task count per stage
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Int, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.add((si.stageId, si.name.takeWhile(_ != '\n').take(60),
          m.executorCpuTime / 1000000, si.numTasks,
          m.executorRunTime))
      }
    })
    def dumpStages(tag: String): Unit = {
      import scala.jdk.CollectionConverters._
      val xs = stages.asScala.toVector
      stages.clear()
      val tot = xs.map(_._3).sum
      println(f"[ccprof] --- $tag: ${xs.size} stages, sum executorCpu=${tot / 1000.0}%.2f s")
      xs.sortBy(-_._3).take(12).foreach { case (id, nm, cpuMs, nt, runMs) =>
        println(f"[ccprof]   stage $id%4d cpu=${cpuMs / 1000.0}%7.2f run=${runMs / 1000.0}%7.2f tasks=$nt%3d  $nm")
      }
    }

    def time(name: String)(f: => Long): Unit = {
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      val n = f
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (osBean.getProcessCpuTime - c0) / 1e9
      println(f"[ccprof] $name%-22s wall=$wall%7.2f cpu=$cpu%7.2f rows=$n")
    }

    val docs = Tables.documents(spark, sfDir)
    // warmup whole query once
    Dedup.dedupClusters(docs).agg(count(lit(1))).collect()
    spark.catalog.clearCache()

    val sig = Dedup.minhashSig(docs).cache()
    time("sig")(sig.count())
    val bnd = Dedup.minhashBands(sig)
    time("bands")(bnd.count())
    val pairs = Dedup.cappedBandPairs(bnd, Dedup.BucketCap).cache()
    time("cappedBandPairs")(pairs.count())
    val est = Dedup.minhashPairsCapped(docs, Dedup.BucketCap).cache()
    time("pairs+est (full)")(est.count())
    val edges = est.filter(col("est_jaccard") >= 0.5).cache()
    time("edges")(edges.count())
    time("cc")(Dedup.connectedComponents(edges).count())
    spark.catalog.clearCache()
    stages.clear()
    time("dedup_clusters e2e")(Dedup.dedupClusters(docs).count())
    dumpStages("dedup_clusters")
    spark.catalog.clearCache()
    stages.clear()
    time("dedup_corpus e2e")(Dedup.dedupCorpus(docs).count())
    dumpStages("dedup_corpus")
    spark.stop()
  }
}
