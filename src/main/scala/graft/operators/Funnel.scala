package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-sequence (funnel) analytics: for each user, the time of the
  * first step-1 event, the first step-2 event strictly after it, the first
  * step-3 event strictly after that, … and the furthest stage reached.
  * The standard conversion-analysis shape over an event stream.
  *
  * Spark-first plan: ONE shuffle on user_id, then a chain of whole-
  * partition conditional-min windows (step i's window condition references
  * step i-1's column — Catalyst stacks the windows over the same
  * partitioning with no extra exchange, exactly like [[AsOfJoin]]), and
  * the final per-user groupBy reuses the window's hash partitioning, so
  * it shuffles nothing. At 100 TB this is a single keyed repartition of
  * the filtered event stream — no joins, no per-user explode.
  */
object Funnel {

  /** steps(0), then steps(1) strictly after it, etc. Returns one row per
    * user that has at least one event of any step type: (user_id, stage ∈
    * [0, steps.length], t1..tN epoch-seconds, -1 where the stage was never
    * reached — sentinels keep the driver's hash-compare total). */
  def funnel(events: DataFrame, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty)
    val w = Window.partitionBy(col("user_id"))
    val base = events
      .filter(col("event_type").isin(steps.map(s => s: Any): _*))
      .select(col("user_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ts_s"))
    val staged = steps.zipWithIndex.foldLeft(base) { case (df, (step, i)) =>
      val cond =
        if (i == 0) col("event_type") === step
        else col("event_type") === step && col("ts_s") > col(s"t$i")
      df.withColumn(s"t${i + 1}", min(when(cond, col("ts_s"))).over(w))
    }
    val tCols = steps.indices.map(i => col(s"t${i + 1}"))
    val stage = tCols.map(t => when(t.isNotNull, 1L).otherwise(0L))
      .reduce(_ + _)
    staged.groupBy(col("user_id"))
      .agg(max(tCols.head).as("t1"),
        tCols.tail.zipWithIndex.map { case (t, i) =>
          max(t).as(s"t${i + 2}")
        }: _*)
      .select(col("user_id") +: stage.as("stage") +:
        steps.indices.map(i => coalesce(col(s"t${i + 1}"), lit(-1L))
          .as(s"t${i + 1}")): _*)
  }

  /** DuckDB oracle dual — the same stacked-window formulation. */
  def funnelSql(table: String, steps: Seq[String]): String = {
    val types = steps.map(s => s"'$s'").mkString(", ")
    val wctes = steps.zipWithIndex.map { case (step, i) =>
      val cond =
        if (i == 0) s"event_type = '$step'"
        else s"event_type = '$step' AND ts_s > t$i"
      s"""w${i + 1} AS (SELECT *,
         |  min(CASE WHEN $cond THEN ts_s END)
         |    OVER (PARTITION BY user_id) AS t${i + 1}
         |  FROM w$i)""".stripMargin
    }.mkString(",\n")
    val stage = steps.indices
      .map(i => s"CASE WHEN max(t${i + 1}) IS NOT NULL THEN 1 ELSE 0 END")
      .mkString(" + ")
    val touts = steps.indices
      .map(i => s"COALESCE(max(t${i + 1}), -1) AS t${i + 1}").mkString(", ")
    s"""WITH w0 AS (SELECT user_id, event_type,
       |              CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
       |            FROM $table WHERE event_type IN ($types)),
       |$wctes
       |SELECT user_id, CAST($stage AS BIGINT) AS stage, $touts
       |FROM w${steps.length} GROUP BY user_id""".stripMargin
  }
}
