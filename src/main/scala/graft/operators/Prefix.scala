package graft.operators

import graft.Ckpt.PinOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Range-partitioned two-pass parallel prefix sum — the scale-safe
  * replacement for a global `Window.orderBy(...)` running sum, which Spark
  * plans as an `Exchange SinglePartition` + one task holding the entire
  * relation (fine at fixture scale, the whole job at 100 TB).
  *
  * Pass 1: a caller-supplied `pid` column — any WEAKLY MONOTONE (w.r.t. the
  * requested order), deterministic, bounded-domain function of the row —
  * spreads the relation over partitions, and a pid-partitioned window
  * computes partition-LOCAL exclusive prefix sums. Pass 2 adds each
  * partition's offset: the total mass of all earlier partitions, obtained
  * from a ≤`parts`²-pair triangular broadcast self-join over the per-pid
  * masses (no single-partition window anywhere in the plan).
  *
  * Deriving pid from row VALUES (a bin of the key's range) rather than
  * `spark_partition_id()` keeps the three consumers of the input trivially
  * consistent with each other; callers should still `localCheckpoint` the
  * input if it is expensive to recompute (this helper consumes it three
  * times). Used by q48 (equi-depth histogram), pp10 (curriculum shards) and
  * q49 (running distinct users); tx6 keeps its own rank variant (row_number
  * needs the range-partitioned form because the vocabulary's zipfian count
  * distribution defeats value binning).
  */
object Prefix {

  /** The triangular exclusive-prefix join over a SMALL per-key mass
    * relation: for each `key`, the sum of every strictly-smaller key's
    * `mass` (0 for the smallest). ≤|keys|² broadcast pairs — the keys here
    * are partition/bin/group ids (≤ a few dozen), so movement is bytes.
    * Output is `(key, mass, as)`: `mass` rides along in the grouping
    * (functionally dependent on `key` — the input has one row per key), so
    * callers that need both the offset and the per-key mass don't re-join
    * the mass relation and replan its upstream exchange. Shared by
    * [[exclusiveSum]], [[rankedIds]] and Events.groupMedian — one
    * implementation of the offsets step, not three. */
  def triangularOffsets(masses: DataFrame, key: String, mass: String, as: String): DataFrame =
    masses
      .join(broadcast(masses.select(col(key).as("__tk_b"), col(mass).as("__tm_b"))),
        col("__tk_b") < col(key), "left")
      .groupBy(key, mass).agg(coalesce(sum("__tm_b"), lit(0L)).as(as))

  /** Adds `as` = exclusive prefix sum of `mass` over `ord` order to `df`.
    * `pid` must be weakly monotone ascending w.r.t. `ord` — equal-ord rows
    * may share a bin, bins never interleave. The output keeps all input
    * columns (plus `as`); row order is unspecified, as with any window. */
  def exclusiveSum(
      df: DataFrame, pid: Column, ord: Seq[Column], mass: Column, as: String): DataFrame = {
    val binned = df.withColumn("__pid", pid.cast("int")).withColumn("__mass", mass)
    val local = Window.partitionBy("__pid").orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val psums = binned.groupBy("__pid").agg(sum("__mass").as("__psum"))
    // keep only (key, offset): the mass column riding in triangularOffsets'
    // output must not leak into the caller's frame (its name could collide
    // with a legitimate caller column, and the contract above promises all
    // input columns survive untouched)
    val offsets = triangularOffsets(psums, "__pid", "__psum", "__off")
      .select("__pid", "__off")
    binned
      .withColumn("__local", coalesce(sum("__mass").over(local), lit(0L)))
      .join(broadcast(offsets), "__pid")
      .withColumn(as, col("__local") + col("__off"))
      .drop("__pid", "__mass", "__local", "__off")
  }

  /** Global dense 1-based rank (`row_number` over `ord`) WITHOUT a global
    * window — the two-pass sibling of [[exclusiveSum]] for ranked-id
    * assignment (tx6 vocabulary ids use it): `repartitionByRange` by the
    * sort key itself (balanced for any key distribution, including the
    * zipfian ones that defeat value binning), partition-local `row_number`,
    * plus per-partition row-count offsets from the triangular broadcast
    * join. The ranged input is localCheckpoint'ed so `spark_partition_id()`
    * is read from ONE materialization — pid consistency across the two
    * consumers holds by construction. `ord` keys must be unique (ties would
    * make ranks partition-dependent); the explicit `parts` keeps AQE from
    * re-coalescing the user repartition. */
  def rankedIds(df: DataFrame, ord: Seq[Column], parts: Int, as: String): DataFrame = {
    val ranged = df.repartitionByRange(parts, ord: _*)
      .withColumn("__pid", spark_partition_id())
      .pin()
    val local = Window.partitionBy("__pid").orderBy(ord: _*)
    val counts = ranged.groupBy("__pid").agg(count(lit(1)).as("__pn"))
    val offsets = triangularOffsets(counts, "__pid", "__pn", "__off")
      .select("__pid", "__off") // see exclusiveSum: the mass column must not leak
    ranged
      .withColumn("__rn", row_number().over(local))
      .join(broadcast(offsets), "__pid")
      .withColumn(as, col("__off") + col("__rn"))
      .drop("__pid", "__rn", "__off")
  }

  /** pid for a numeric key: its bin in an equi-width split of [mn, mx] into
    * `parts` bins — weakly monotone ascending in `key` (numeric→double
    * cast, ×, ÷, floor are monotone; FP rounding at bin edges only shifts a
    * boundary, never reorders). `mn`/`mx` are columns (typically broadcast
    * 1-row aggregates) so the expression stays pure and deterministic.
    * Operands cast to double BEFORE subtracting: `key - mn` in the source
    * type could wrap for long domains spanning more than 2^63. */
  def rangeBin(key: Column, mn: Column, mx: Column, parts: Int): Column = {
    val (k, lo, hi) = (key.cast("double"), mn.cast("double"), mx.cast("double"))
    when(mx === mn, lit(0)).otherwise(
      least(lit(parts - 1), greatest(lit(0), floor((k - lo) * parts / (hi - lo)))))
  }
}
