package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** AS-OF JOIN — the canonical "operator Spark lacks" (brief §custom
  * operators: compose existing ops when semantics allow, SURVEY.md §7.1):
  * for each LEFT event, attach the most recent strictly-earlier RIGHT
  * event of the same key (e.g. each purchase joined to the view that
  * preceded it — attribution).
  *
  * Spark-first formulation: instead of a range-condition join (which
  * Catalyst can only execute as BroadcastNestedLoop/cartesian) both event
  * types flow as ONE stream per key and a running
  * `last(right_value) ignoreNulls` over (time, id) order with a frame
  * ending at the PREVIOUS row carries the as-of value forward. One shuffle
  * on the key + one sort, no join operator at all — the only shape that
  * scales to 100 TB of events. DuckDB's native ASOF JOIN defines the
  * semantics; the oracle dual uses the same window formulation so the
  * row stream matches exactly (no float arithmetic — values are carried,
  * never combined, so no rounding is needed).
  */
object AsOfJoin {

  /** events: (user_id, event_id, ts, event_type, value). Returns, for each
    * `leftType` event: (user_id, event_id, ts_s, value, asof_value,
    * asof_ts) with the latest strictly-preceding `rightType` value and its
    * timestamp for the same user ((ts, event_id) order; 0.0/-1 sentinels
    * when no prior right event exists — a NULL would carry the same
    * information but sentinels keep the driver's hash-compare total). */
  def asOf(events: DataFrame, leftType: String, rightType: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_s"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val rightVal = when(col("event_type") === rightType, col("value"))
    val rightTs = when(col("event_type") === rightType, col("ts_s"))
    events
      .filter(col("event_type").isin(leftType, rightType))
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("ts_s"), col("value"))
      .withColumn("asof_value", last(rightVal, ignoreNulls = true).over(w))
      .withColumn("asof_ts", last(rightTs, ignoreNulls = true).over(w))
      .filter(col("event_type") === leftType)
      .select(col("user_id"), col("event_id"), col("ts_s"), col("value"),
        coalesce(col("asof_value"), lit(0.0)).as("asof_value"),
        coalesce(col("asof_ts"), lit(-1L)).as("asof_ts"))
  }

  /** DuckDB oracle dual — the same union+window formulation. */
  def asOfSql(table: String, leftType: String, rightType: String): String =
    s"""WITH e AS (SELECT user_id, event_id, event_type,
       |             CAST(floor(epoch(ts)) AS BIGINT) AS ts_s, value
       |           FROM $table WHERE event_type IN ('$leftType', '$rightType')),
       |w AS (SELECT user_id, event_id, event_type, ts_s, value,
       |        last_value(CASE WHEN event_type = '$rightType' THEN value END IGNORE NULLS)
       |          OVER win AS asof_value,
       |        last_value(CASE WHEN event_type = '$rightType' THEN ts_s END IGNORE NULLS)
       |          OVER win AS asof_ts
       |      FROM e
       |      WINDOW win AS (PARTITION BY user_id ORDER BY ts_s, event_id
       |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
       |SELECT user_id, event_id, ts_s, value,
       |       COALESCE(asof_value, 0.0) AS asof_value,
       |       COALESCE(asof_ts, -1) AS asof_ts
       |FROM w WHERE event_type = '$leftType'""".stripMargin
}
