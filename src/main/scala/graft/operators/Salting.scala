package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
