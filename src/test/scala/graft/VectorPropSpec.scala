package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.VectorFunctions

/** Property: the codegen'd FloatVectorDot equals the interpreted HOF
  * composition on arbitrary float arrays — unequal lengths, empty arrays,
  * and non-finite values (NaN/±Inf) included. Spark's `<=>` treats NULL
  * and NaN as self-equal, so every outcome class (value, NULL from length
  * mismatch, NaN from non-finite math) is compared faithfully. */
class VectorPropSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val floatGen: Gen[Float] = Gen.frequency(
    8 -> Gen.choose(-1e6f, 1e6f),
    1 -> Gen.oneOf(0.0f, -0.0f, Float.MinPositiveValue, Float.MaxValue),
    1 -> Gen.oneOf(Float.NaN, Float.PositiveInfinity, Float.NegativeInfinity))

  private val pairGen: Gen[(Array[Float], Array[Float])] = for {
    n <- Gen.choose(0, 16)
    m <- Gen.frequency(4 -> Gen.const(n), 1 -> Gen.choose(0, 16)) // mostly equal lengths
    a <- Gen.listOfN(n, floatGen)
    b <- Gen.listOfN(m, floatGen)
  } yield (a.toArray, b.toArray)

  test("dotFast equals the HOF composition bit-for-bit on random arrays") {
    import spark.implicits._
    val pairs = Gen.listOfN(300, pairGen).pureApply(Gen.Parameters.default, Seed(42L))
    val df = pairs.toDF("a", "b")
    val disagree = df.select(
      VectorFunctions.dotFast(col("a"), col("b")).as("fast"),
      VectorFunctions.dot(col("a"), col("b")).as("hof"))
      .filter(!(col("fast") <=> col("hof")))
    assert(disagree.count() == 0)
  }
}
