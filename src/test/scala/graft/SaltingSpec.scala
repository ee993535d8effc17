package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Salting

class SaltingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  test("salted join equals the plain join and spreads the hot key") {
    // make lineitem artificially skewed: collapse most keys onto one
    val skewed = Tables(spark, sf, "lineitem")
      .withColumn("jkey", when(col("l_orderkey") % 4 === 0, lit(0L))
        .otherwise(col("l_orderkey") % 16))
      .select("jkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    val dim = Tables(spark, sf, "orders")
      .select((col("o_orderkey") % 16).as("jkey"), col("o_orderpriority"))
      .distinct()

    val plain = skewed.join(dim, "jkey")
      .groupBy("jkey").agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("s"))
      .collect().map(_.toString).sorted.toSeq
    val salted = Salting.saltedEquiJoin(
        skewed, dim, "jkey",
        saltBy = Seq(col("l_orderkey"), col("l_linenumber")), factor = 8)
      .groupBy("jkey").agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("s"))
      .collect().map(_.toString).sorted.toSeq
    assert(salted == plain)

    // the hot key's rows actually land in multiple salt partitions
    val spread = skewed
      .withColumn("__salt", pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(8)))
      .filter(col("jkey") === 0)
      .select("__salt").distinct().count()
    assert(spread > 1)
  }

  test("sj1: the registered salted join runs in the shuffle regime, not broadcast") {
    val p = Registry.queries("sj1_salted_join")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"),
      "the shuffle_hash hint must hold — a broadcast join has no straggler for salting to fix")
    assert(!p.contains("BroadcastHashJoin"), "dimension side unexpectedly broadcast")
  }

  test("sj2: salted two-phase top-k equals the single-window form on a hot-key corpus") {
    // 80% of rows on one key — the distribution the fixture doesn't have
    val ev = spark.range(5000).select(
      col("id").as("event_id"),
      when(col("id") % 5 =!= 0, lit("hot"))
        .otherwise(concat(lit("t"), col("id") % 7)).as("event_type"),
      (pmod(hash(col("id")), lit(100000)).cast("double") / 100).as("value"))
    val salted = Salting.saltedTopK(ev, k = 5, factor = 8)
      .collect().map(_.toString).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type").orderBy(col("value").desc, col("event_id"))
    val plain = ev.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= 5)
      .select("event_type", "rk", "event_id", "value")
      .orderBy("event_type", "rk")
      .collect().map(_.toString).toSeq
    assert(salted == plain)

    // phase 1 really prunes: survivors per key are capped at k·factor
    val phase1 = ev.withColumn("__salt", pmod(hash(col("event_id")), lit(8)))
      .withColumn("__prn", row_number().over(org.apache.spark.sql.expressions.Window
        .partitionBy("event_type", "__salt").orderBy(col("value").desc, col("event_id"))))
      .filter(col("__prn") <= 5)
      .groupBy("event_type").count().collect()
    assert(phase1.forall(_.getLong(1) <= 5 * 8))
    assert(phase1.exists(_.getLong(1) > 5), "hot key should keep multiple salt buckets' partials")
  }
}
