package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Skew-join salting: when one join key carries a disproportionate share of
  * rows, a plain shuffle join puts that key's entire volume on one task.
  * AQE's skew-join split handles sort-merge cases adaptively; this utility
  * is the deterministic fallback that also works for broadcast-ineligible
  * dimension joins and in static plans:
  *
  *  - the skewed (large) side gets a salt in [0, factor) derived from
  *    stable row attributes — spreading each hot key over `factor` tasks;
  *  - the other side is replicated `factor` times (explode over the salt
  *    range) so every salted partition finds its match.
  *
  * Cost: |small side| × factor extra rows shuffled — the standard trade for
  * eliminating the straggler task. Salt is `pmod(hash(salt cols), factor)`,
  * so results are deterministic (no rand()).
  */
object Salting {

  /** Equi-join `large ⋈ small` on `key`, salted `factor` ways. `saltBy` are
    * stable large-side columns that spread rows within a hot key (e.g. a
    * row id). Returns the joined frame with working columns dropped. */
  def saltedEquiJoin(
      large: DataFrame,
      small: DataFrame,
      key: String,
      saltBy: Seq[Column],
      factor: Int): DataFrame = {
    require(!large.columns.contains("__salt") && !small.columns.contains("__salt"),
      "saltedEquiJoin uses a __salt working column; inputs must not already have one")
    val salted = large.withColumn("__salt", pmod(hash(saltBy: _*), lit(factor)))
    val replicated = small.withColumn("__salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables(s, d, n)

  /** sj1: the salted join registered as a query — events (fact) ⋈ customer
    * (dimension) on `user_id = c_custkey`, salted 8 ways, then aggregated
    * per market segment. The dimension side carries a `shuffle_hash` hint
    * so the query exercises the SHUFFLE regime salting exists for (a
    * broadcast join has no per-key straggler to fix; at 100 TB the
    * dimension may be broadcast-ineligible). Salting is result-invariant —
    * each large-side row meets exactly the one replicated dimension copy
    * sharing its salt — so the oracle is the plain join, and the driver's
    * hash check proves the rewrite preserves semantics. Sums are
    * DECIMAL-exact before the final double cast per the determinism
    * contract. The fixture's user domain is uniform; skew behavior itself
    * is covered by SaltingSpec's synthetic hot-key corpus. */
  def sj1SaltedJoinAgg(s: SparkSession, d: String): DataFrame = {
    val ev = t(s, d, "events")
      .select(col("event_id"), col("user_id"), expr("try_cast(value AS DECIMAL(18,2))").as("v"))
    val cust = t(s, d, "customer")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment"))
      .hint("shuffle_hash")
    saltedEquiJoin(ev, cust, "user_id", Seq(col("event_id")), factor = 8)
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_events"), sum("v").cast("double").as("total_value"))
      .orderBy("c_mktsegment")
  }

  /** sj2: salted two-phase top-k — the holistic-aggregate counterpart of
    * sj1. A plain `row_number() OVER (PARTITION BY key)` top-k moves every
    * row of a hot key into one task; partial aggregation cannot help
    * because rank is holistic. The salt decomposition CAN: top-k within
    * (key, salt) is a superset of the key's true top-k (any global top-k
    * row is top-k in its own salt bucket), so phase 1 prunes each key's
    * volume to ≤ k·factor rows spread over `factor` tasks, and phase 2
    * ranks only those survivors — the straggler task sees k·factor rows
    * per key instead of the key's full mass. Result is identical to the
    * single-window form (oracle-checked). Ties break on event_id, so both
    * phases are deterministic. */
  def sj2SaltedTopK(s: SparkSession, d: String): DataFrame =
    saltedTopK(t(s, d, "events").select(col("event_id"), col("event_type"), col("value")),
      k = 5, factor = 8)

  /** Injectable core of sj2 over any (event_id, event_type, value) frame —
    * SaltingSpec drives it with a synthetic hot-key corpus the uniform
    * fixture cannot produce. */
  def saltedTopK(ev: DataFrame, k: Int, factor: Int): DataFrame = {
    val salted = ev.withColumn("__salt", pmod(hash(col("event_id")), lit(factor)))
    val partial = Window.partitionBy("event_type", "__salt")
      .orderBy(col("value").desc, col("event_id"))
    val fin = Window.partitionBy("event_type")
      .orderBy(col("value").desc, col("event_id"))
    salted.withColumn("__prn", row_number().over(partial)).filter(col("__prn") <= k)
      .withColumn("rk", row_number().over(fin).cast("long")).filter(col("rk") <= k)
      .select("event_type", "rk", "event_id", "value")
      .orderBy("event_type", "rk")
  }
}
