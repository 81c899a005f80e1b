package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    // extra args = dev-loop query-name filter (driver always passes two)
    val (sfDir, outDir) = (args(0), args(1))
    val only = args.drop(2).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // tmpfs shuffle scratch + fork-free local FS (see Scratch.tuneLocalFs)
    val spark = graft.sources.Scratch.tuneLocalFs(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      // let AQE coalesce INSIDE cached plans (off by default): without it a
      // cached tiny table materializes all 32 configured shuffle partitions
      // and every downstream stage pays 32-64 per-task fixed costs -- measured
      // 2.3x of dedup_clusters' warm process CPU. Values are unchanged; at
      // scale AQE still targets its normal partition sizes.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      // same local-shuffle tuning as Bench (see Bench.scala): one spill file
      // per map task instead of `shuffle.partitions` files, and hash-based
      // object aggregation up to 256k groups instead of the 128-key default
      .config("spark.shuffle.sort.bypassMergeThreshold", "2")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "262144")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
      // per-query caches (LSH signature tables etc.) don't accumulate
      // across the 30+ queries of a verify run
      spark.catalog.clearCache()
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // environment fingerprint (VERDICT r12 #1: the r12 driver-only hash
    // mismatches took a round to localize because the artifact carried
    // nothing about the session that produced it) — the DuckDB side's
    // version is printed by scripts/oracle_check.py / the driver
    val env =
      s"""{"spark_version": ${q(spark.version)},
         | "java_version": ${q(System.getProperty("java.version"))},
         | "session_tz": ${q(spark.conf.get("spark.sql.session.timeZone"))},
         | "jvm_tz": ${q(java.util.TimeZone.getDefault.getID)},
         | "ansi": ${
        // RuntimeConfig.get(key, default) type-checks the FALLBACK string
        // against the conf's boolean type, so a non-boolean sentinel
        // throws whenever the key is unset — wrap instead
        q(scala.util.Try(spark.conf.get("spark.sql.ansi.enabled"))
          .getOrElse("default"))}}"""
        .stripMargin
    Files.writeString(Paths.get(s"$outDir/verify_env.json"), env)
    spark.stop()
  }
}
