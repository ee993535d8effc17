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

  test("AQE's skew-join split actually fires on a skewed shuffle join") {
    // several operators defer RESIDUAL skew (the part salting doesn't
    // pre-spread) to AQE's runtime skew-join — this pins that the
    // mechanism engages under this engine's session shape rather than
    // being an assumed backstop. Thresholds are lowered so fixture-scale
    // data qualifies as skewed; the mechanism is the same one a real hot
    // key trips at production sizes.
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32768")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32768")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force a shuffle join
    val left = s.range(0, 200000)
      .select(when(col("id") % 10 === 0, lit(0L)).otherwise(col("id")).as("k"), col("id"))
    val right = s.range(0, 64).select(col("id").as("k"), col("id").as("r"))
    val joined = left.join(right, "k")
    // collect() executes THIS queryExecution (count() would plan a new
    // one and leave this plan unfinalized)
    assert(joined.collect().length > 0)
    val p = joined.queryExecution.executedPlan.toString
    assert(p.contains("isFinalPlan=true"), p.take(300))
    assert(p.contains("skew=true"),
      s"AQE did not mark the skewed join for splitting:\n${p.take(1200)}")
  }
}
