package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions.{window => timeWindow, _}

import graft.Tables

/** Event-stream operators over `events` in batch form. The same
  * `window()`/watermark expressions run unchanged under Structured Streaming
  * — see graft.streaming.StreamingOps for the readStream/writeStream wiring.
  *
  * All sub-second math uses epoch microseconds as longs: parquet ns
  * timestamps truncate to µs identically in Spark and DuckDB, keeping the
  * oracle exact.
  */
object Events {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  /** Tumbling 1-hour windows per event type. Hour buckets align with epoch
    * in both engines (Spark window origin = 1970-01-01, ≡ date_trunc). */
  def tumbling(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(timeWindow(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("w.start").as("w_start"), col("event_type"), col("n"), col("total_value"))
      .orderBy("w_start", "event_type")

  /** Sliding 1-hour windows every 15 minutes (each event lands in 4
    * windows). */
  def sliding(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .groupBy(timeWindow(col("ts"), "1 hour", "15 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("w_start"), col("n"))
      .orderBy("w_start")

  /** Sessionization: 30-minute inactivity gap splits sessions. Classic
    * lag-flag + running-sum session ids, then two-level aggregation. One
    * shuffle on user_id; the windows reuse that partitioning. */
  def sessions(s: SparkSession, d: String): DataFrame = {
    val gapUs = 30L * 60 * 1000000
    val e = t(s, d, "events").withColumn("ts_us", unix_micros(col("ts")))
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val flagged = e.withColumn("new_s",
      when(lag("ts_us", 1).over(w).isNull ||
        col("ts_us") - lag("ts_us", 1).over(w) > gapUs, 1).otherwise(0))
    val sess = flagged.withColumn("session_id",
      sum("new_s").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val perSession = sess.groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        ((max("ts_us") - min("ts_us")) / 1000000L).as("dur_s"))
    perSession.groupBy("user_id")
      .agg(
        count(lit(1)).as("n_sessions"),
        sum("n_events").as("n_events_total"),
        avg("n_events").as("avg_events"), // unrounded: exact-integer ratio
        max("dur_s").as("max_dur_s"))
      .orderBy("user_id")
  }

  /** Top spenders on purchase events — filter + agg + deterministic top-k. */
  def topSpenders(s: SparkSession, d: String): DataFrame =
    t(s, d, "events")
      .filter(col("event_type") === "purchase")
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_purchases"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("spend"))
      .orderBy(col("spend").desc, col("user_id"))
      .limit(10)
}
