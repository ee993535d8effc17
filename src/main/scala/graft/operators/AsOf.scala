package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of (point-in-time) join — an operator Spark lacks natively.
  *
  * Built by composition (preference (a) over a custom SparkPlan): tag both
  * inputs, UNION them, and take `last_value(ignoreNulls)` of the right
  * side's columns over a (key, time)-ordered running window. This is the
  * scale-correct formulation: ONE shuffle on the join key, linear in
  * |left|+|right|, no range-join explosion and no per-row subquery. A naive
  * theta-join `l.t >= r.t` is O(|L|·|R|) before aggregation; this is what
  * you use at 100 TB instead.
  *
  * Tie-breaks are total (t, side, right-id), so the picked row is
  * deterministic and the DuckDB oracle (same construction in SQL) matches
  * exactly.
  */
object AsOf {

  /** Banded range join: pairs of events from the same user within a 60 s
    * window. A naive theta join (`0 < b.ts - a.ts <= 60s`) is O(|per-user|²)
    * comparisons with no equi-key for the shuffle; bucketing time into
    * window-sized bands turns it into an equi-join on (user, band) — each
    * left row probes its own band and the next one, then the exact range
    * predicate filters. Shuffle key stays compact and the comparison count
    * drops to true-neighborhood size. Same result as the naive oracle join.
    */
  def eventPairsWithin60s(s: SparkSession, d: String): DataFrame = {
    val winUs = 60L * 1000000
    val e = Tables(s, d, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("band", expr(s"ts_us DIV $winUs"))
    val probes = e.select(
      col("user_id"), col("event_id").as("id_a"), col("ts_us").as("ts_a"),
      explode(array(col("band"), col("band") + 1)).as("band"))
    val right = e.select(
      col("user_id"), col("event_id").as("id_b"), col("ts_us").as("ts_b"), col("band"))
    probes.join(right, Seq("user_id", "band"))
      .filter(col("ts_b") > col("ts_a") && col("ts_b") <= col("ts_a") + winUs)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_pairs"))
      .orderBy("user_id")
  }

  /** For every event, the most recent order of the same customer at or
    * before the event time. */
  def eventsLatestOrder(s: SparkSession, d: String): DataFrame = {
    val e = Tables(s, d, "events").select(
      col("user_id").as("k"),
      unix_micros(col("ts")).as("t"),
      lit(1).as("is_l"),
      col("event_id"),
      lit(null).cast("long").as("o_orderkey"),
      lit(null).cast("double").as("o_totalprice"))
    val o = Tables(s, d, "orders").select(
      col("o_custkey").as("k"),
      // o_orderdate is TIMESTAMP_NTZ; session TZ is UTC so the cast is the
      // identity and epoch µs match DuckDB's epoch_us exactly
      unix_micros(col("o_orderdate").cast("timestamp")).as("t"),
      lit(0).as("is_l"),
      lit(null).cast("long").as("event_id"),
      col("o_orderkey"),
      col("o_totalprice"))
    // right rows sort before left rows at equal t (asof >=); same-timestamp
    // right rows resolve to the max o_orderkey
    val w = Window.partitionBy("k")
      .orderBy(col("t"), col("is_l"), col("o_orderkey").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.unionByName(o)
      .withColumn("asof_orderkey", last("o_orderkey", ignoreNulls = true).over(w))
      .withColumn("asof_totalprice", last("o_totalprice", ignoreNulls = true).over(w))
      .filter(col("is_l") === 1)
      .select(
        col("event_id"), col("k").as("user_id"),
        col("asof_orderkey"), col("asof_totalprice"))
      .orderBy("event_id")
  }
}
