package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, sum, xxhash64}

/** Throwaway per-stage profiler for one SparkEntry query (VERDICT r9 #2:
  * where do the Broadcast-arm fan-out's fixed ~8 CPU-s go?): runs the named
  * query once warm, once measured, and dumps executor CPU per stage. */
object QProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = graft.sources.Scratch.tuneLocalFs(SparkSession.builder())
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("GRAFT_AQE", "true"))
      .config("spark.shuffle.sort.bypassMergeThreshold", sys.env.getOrElse("GRAFT_BYPASS", "200"))
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", sys.env.getOrElse("GRAFT_OHA", "128"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Int, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val m = si.taskMetrics
        stages.add((si.stageId, si.name.takeWhile(_ != '\n').take(70),
          m.executorCpuTime / 1000000, si.numTasks, m.executorRunTime))
        println(f"[qprofm] stage ${si.stageId} tasks=${si.numTasks} " +
          f"deserT=${m.executorDeserializeTime} deserCpu=${m.executorDeserializeCpuTime / 1000000} " +
          f"gc=${m.jvmGCTime} resSer=${m.resultSerializationTime} " +
          f"shROrecords=${m.shuffleReadMetrics.recordsRead} shRwait=${m.shuffleReadMetrics.fetchWaitTime} " +
          f"shWtime=${m.shuffleWriteMetrics.writeTime / 1000000} peakMem=${m.peakExecutionMemory}")
      }
    })
    def force(): Unit = {
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      val h = xxhash64(df.columns.map(col).toIndexedSeq: _*)
      df.select(h.cast("double").as("h")).agg(sum(col("h"))).collect()
      ()
    }
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    force(); spark.catalog.clearCache()
    Thread.sleep(300); stages.clear()
    // poor-man's sampling profiler over executor task threads
    val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = new Thread(() => {
      while (sampling) {
        val all = Thread.getAllStackTraces
        all.forEach { (t, st) =>
          val group = if (t.getName.contains("Executor task launch")) "exec"
            else if (t.getName.contains("stream execution") ||
                     t.getName.contains("microBatch") || t.getName == "main" ||
                     t.getName.contains("QueryStage")) "drv"
            else null
          if (group != null && st.nonEmpty && t.getState == Thread.State.RUNNABLE) {
            val depth = if (st.exists(_.getClassName.contains("hadoop.util.Shell"))) 24 else 8
            val key = group + "| " + st.take(depth).map(f =>
              f.getClassName + "." + f.getMethodName).mkString(" <- ")
            samples.merge(key, 1, (a, b) => a + b)
          }
        }
        Thread.sleep(5)
      }
    })
    sampler.setDaemon(true); sampler.start()
    val c0 = osBean.getProcessCpuTime
    val t0 = System.nanoTime()
    (1 to 10).foreach { _ => force(); spark.catalog.clearCache() }
    sampling = false
    val wall = (System.nanoTime() - t0) / 1e9
    val cpu = (osBean.getProcessCpuTime - c0) / 1e9
    import scala.jdk.CollectionConverters._
    val xs = stages.asScala.toVector
    println(f"[qprof] $name wall=$wall%.2f processCpu=$cpu%.2f sumStageCpu=${xs.map(_._3).sum / 1000.0}%.2f")
    xs.sortBy(-_._3).take(15).foreach { case (id, nm, cpuMs, nt, runMs) =>
      println(f"[qprof]   stage $id%4d cpu=${cpuMs / 1000.0}%7.2f run=${runMs / 1000.0}%7.2f tasks=$nt%3d  $nm")
    }
    import scala.jdk.CollectionConverters._
    samples.asScala.toVector.sortBy(-_._2).take(20).foreach { case (k, n) =>
      println(s"[qstack] $n  $k")
    }
    spark.stop()
  }
}
