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
  * Usage: runMain graft.tools.KernelRatioProfile <sfDir> <kernel...>
  *          [plans] [big]
  * `big` measures the 20×-KV measurement shape Bench now grades
  * (VERDICT r13 #2) instead of the graded fixture shape.
  */
object KernelRatioProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val showPlans = args.contains("plans")
    val useBig = args.contains("big")
    val kernels = args.drop(1).filter(a => a != "plans" && a != "big")
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
    // per-arm task histogram: stragglers (max >> p50) vs uniformly slower
    object Tasks extends org.apache.spark.scheduler.SparkListener {
      val durs =
        new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long)]()
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        if (t.taskInfo != null) durs.add((t.stageId, t.taskInfo.duration)); ()
      }
      def reset(): Unit = durs.clear()
      def report(tag: String): Unit = {
        import scala.jdk.CollectionConverters._
        val all = durs.asScala.toSeq
        val d = all.map(_._2).sorted
        if (d.nonEmpty) println(f"TASKS $tag n=${d.size} sum=${d.sum}ms " +
          f"p50=${d(d.size / 2)}ms max=${d.last}ms")
        all.groupBy(_._1).toSeq.sortBy(_._1).foreach { case (st, ts) =>
          val s = ts.map(_._2)
          println(s"  stage=$st n=${s.size} sum=${s.sum}ms max=${s.max}ms")
        }
      }
    }
    spark.sparkContext.addSparkListener(Tasks)
    def force(df: DataFrame): Unit = {
      val h = xxhash64(df.columns.map(col).toIndexedSeq: _*)
      df.select(h.cast("double").as("h")).agg(sum(col("h"))).collect(); ()
    }
    kernels.foreach { kernel =>
      val fn =
        if (useBig) graft.queries.MatrixQueries.modalKernelsBig(kernel)
        else graft.queries.MatrixQueries.modalKernels(kernel)
      if (showPlans) {
        println(s"== $kernel BLOCKED plan ==")
        fn(spark, sfDir, PairPlan.Blocked).explain("formatted")
        println(s"== $kernel BROADCAST plan ==")
        fn(spark, sfDir, PairPlan.Broadcast).explain("formatted")
      }
      // joint warmup + interleaved timed pairs — the exact Bench protocol
      force(fn(spark, sfDir, PairPlan.Blocked))
      force(fn(spark, sfDir, PairPlan.Broadcast))
      val osBean = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean
        .asInstanceOf[com.sun.management.OperatingSystemMXBean]
      val runs = (1 to 5).map { i =>
        Tasks.reset()
        val c0 = osBean.getProcessCpuTime
        val t0 = System.nanoTime()
        force(fn(spark, sfDir, PairPlan.Blocked))
        val bl = (System.nanoTime() - t0) / 1e9
        val blc = (osBean.getProcessCpuTime - c0) / 1e9
        if (i == 3) Tasks.report(s"$kernel blocked")
        Tasks.reset()
        val c1 = osBean.getProcessCpuTime
        val t1 = System.nanoTime()
        force(fn(spark, sfDir, PairPlan.Broadcast))
        val br = (System.nanoTime() - t1) / 1e9
        val brc = (osBean.getProcessCpuTime - c1) / 1e9
        if (i == 3) Tasks.report(s"$kernel broadcast")
        spark.catalog.clearCache()
        (bl, br, bl / math.max(br, 1e-9), blc / math.max(brc, 1e-9))
      }
      val bl = runs.map(_._1).sorted.apply(2)
      val br = runs.map(_._2).sorted.apply(2)
      val wr = runs.map(_._3).sorted.apply(2)
      val cr = runs.map(_._4).sorted.apply(2)
      println(f"KERNEL $kernel blocked=$bl%.3f broadcast=$br%.3f " +
        f"ratio=$wr%.3f cpu_ratio=$cr%.3f")
    }
    spark.stop()
  }
}
