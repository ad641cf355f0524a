package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream operators over `events(event_id, ts, user_id, event_type,
 * value, props)` — the windowed-computation surface of the engine
 * (the reference's only windowed computation is a cumulative histogram;
 * a training-data pipeline needs per-user sessionization and windowed
 * rates as first-class operators).
 *
 * Both operators are one `Window.partitionBy(user_id).orderBy(ts)` pass:
 * the shuffle is by user (the natural key; skew-safe under AQE), and the
 * per-user frames are small.
 */
object Events {

  /**
   * Gap-based sessionization: a new session starts when the time since
   * the user's previous event exceeds `gapMinutes`. session_seq is the
   * per-user running count of session starts — deterministic, and
   * expressible identically in any SQL engine (lag + conditional cumsum).
   */
  def sessionize(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("is_start",
        when(col("prev_ts").isNull ||
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts")) > gapMinutes * 60L, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("is_start")).over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("event_id"), col("user_id"), col("ts"), col("session_seq"))
  }

  /** Per-user session stats: events per session, span in seconds. */
  def sessionStats(events: DataFrame, gapMinutes: Int): DataFrame =
    sessionize(events, gapMinutes)
      .groupBy("user_id", "session_seq")
      .agg(
        count(lit(1)).as("n_events"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts")))).as("span_sec"))
}
