package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

/** Gap-based sessionization over an event stream: a new session starts
  * when the time since the key's previous event STRICTLY exceeds the gap.
  * The batch twin of Structured Streaming's `session_window` (same
  * semantics for a closed, fully-arrived window of events).
  *
  * Plan shape: one hash exchange on the key + per-key sort; the session
  * index is a running sum of new-session flags over that one window —
  * no self-join, no explode. Scales with rows per key, not sessions².
  */
object Sessions {

  /** Adds `session_idx` (1-based per key, in time order). Gap comparison
    * runs on integer epoch micros — exact, engine-portable.
    * @param tieBreak extra sort columns making the per-key order total
    *                 when timestamps can collide (determinism contract)
    */
  def sessionize(
      events: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long, tieBreak: Seq[String] = Nil): DataFrame = {
    val ord = (col(tsCol) +: tieBreak.map(col)).map(_.asc)
    val w = Window.partitionBy(col(keyCol)).orderBy(ord: _*)
    // unix_micros rejects TIMESTAMP_NTZ (what Spark 4 infers for parquet
    // timestamp[us] without a timezone). NTZ wall times are relabeled as
    // UTC instants EXPLICITLY (to_utc_timestamp with a pinned "UTC"
    // source zone) rather than via a bare cast: the cast interprets NTZ
    // in the session timezone, and under any DST zone that mapping is
    // non-monotonic — a 7-minute real gap straddling spring-forward
    // would compute as 67 minutes and spuriously split a session. UTC
    // relabeling is exact and session-config-independent.
    val micros = events.schema(tsCol).dataType match {
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_micros(to_utc_timestamp(col(tsCol), "UTC"))
      case _ => unix_micros(col(tsCol).cast(TimestampType))
    }
    val prev = lag(micros, 1).over(w)
    val newSession = when(prev.isNull || micros - prev > gapSeconds * 1000000L, 1)
      .otherwise(0)
    events
      .withColumn("__new", newSession)
      .withColumn("session_idx",
        sum(col("__new")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__new")
  }

  /** One row per (key, session): event count and start/end times — the
    * usual downstream shape (session length, inter-session stats). */
  def sessionStats(
      events: DataFrame, keyCol: String, tsCol: String,
      gapSeconds: Long, tieBreak: Seq[String] = Nil): DataFrame =
    sessionize(events, keyCol, tsCol, gapSeconds, tieBreak)
      .groupBy(col(keyCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"))
}
