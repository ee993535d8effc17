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
}
