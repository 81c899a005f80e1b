package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VecOps

/** Time-series resampling with gap fill — regularize an irregular event
  * stream onto a fixed calendar grid: per user, one row per day between
  * the corpus's first and last day; days with no events get n = 0 and the
  * value carried forward from the last observed day (0.0 before the first
  * observation). The resample→fill step every time-series feature
  * pipeline runs before windowed model features.
  *
  * Scale shape: events collapse to (key, day) bins with map-side combine
  * before the only event-volume shuffle; the calendar derives from a
  * 1-row global min/max aggregate (broadcast), so the key×day grid is
  * keys·days rows — independent of event count; the carry-forward is one
  * sorted window pass inside each key partition. No per-event state, no
  * global sort. At 100 TB of events the grid side stays tiny relative to
  * the bin side.
  *
  * Determinism: n is exact; the carried value is a per-day double sum,
  * qround(4)-ed only at output, so cross-engine reassociation error stays
  * far below the grid (the same contract as every money sum here).
  */
object Resample {

  def dailyValue(events: DataFrame): DataFrame = {
    val bins = events
      .groupBy(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
      .agg(sum(col("value")).as("day_val"), count(lit(1)).as("n"))
    val lim = events.agg(
      date_trunc("DAY", min(col("ts"))).as("d0"),
      date_trunc("DAY", max(col("ts"))).as("d1"))
    val cal = lim.select(
      explode(sequence(col("d0"), col("d1"), expr("INTERVAL 1 DAY")))
        .as("day"))
    val grid = events.select(col("user_id")).distinct()
      .crossJoin(broadcast(cal))
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(bins, Seq("user_id", "day"), "left")
      .withColumn("filled",
        coalesce(last(col("day_val"), ignoreNulls = true).over(w), lit(0.0)))
      .select(col("user_id"),
        date_format(col("day"), "yyyy-MM-dd").as("day"),
        coalesce(col("n"), lit(0L)).as("n"),
        VecOps.qround(col("filled"), 4).as("filled"))
  }

  /** DuckDB dual: generate_series calendar, LEFT JOIN, IGNORE NULLS
    * carry-forward window. */
  def dailyValueSql(table: String): String =
    s"""WITH b AS (SELECT user_id, date_trunc('day', ts) AS day,
       |             sum(value) AS day_val, count(*) AS n
       |           FROM $table GROUP BY user_id, date_trunc('day', ts)),
       |lim AS (SELECT date_trunc('day', min(ts)) AS d0,
       |               date_trunc('day', max(ts)) AS d1 FROM $table),
       |cal AS (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
       |        FROM lim),
       |u AS (SELECT DISTINCT user_id FROM $table),
       |grid AS (SELECT user_id, day FROM u CROSS JOIN cal),
       |j AS (SELECT g.user_id, g.day, b.day_val, coalesce(b.n, 0) AS n
       |      FROM grid g LEFT JOIN b ON g.user_id = b.user_id AND g.day = b.day),
       |f AS (SELECT user_id, day, n,
       |        coalesce(last_value(day_val IGNORE NULLS) OVER (
       |          PARTITION BY user_id ORDER BY day
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS filled
       |      FROM j)
       |SELECT user_id, strftime(day, '%Y-%m-%d') AS day, n,
       |  ${VecOps.qroundSql("filled", 4)} AS filled
       |FROM f""".stripMargin
}
