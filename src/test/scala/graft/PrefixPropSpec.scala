package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Prefix

/** Property: the two-pass range-partitioned prefix sum equals a sequential
  * scan for ANY (unique-key, mass) relation, any bin count — including
  * parts = 1 (degenerates to one partition, still correct), more bins than
  * rows, clustered/skewed keys (everything in one bin), negative and
  * wide-magnitude keys, and the DESC order used by pp10. This is the
  * contract the four converted registry queries (q48/tx6-shape/pp10/q49)
  * lean on; the oracle gate checks them on fixture data, this spec checks
  * the primitive on adversarial shapes. Generators are ScalaCheck with
  * fixed seeds (the scalatest-scalacheck bridge isn't in the offline
  * cache).
  */
class PrefixPropSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Distributed exclusive prefix via Prefix.exclusiveSum with a rangeBin
    * pid, collected as key → cb. */
  private def distributed(pairs: Seq[(Long, Long)], parts: Int, desc: Boolean): Map[Long, Long] = {
    import spark.implicits._
    val df = pairs.toDF("key", "mass")
    val stat = df.agg(min("key").as("mn"), max("key").as("mx"))
    val binKey = if (desc) col("key") * -1 else col("key")
    val (lo, hi) = if (desc) (col("mx") * -1, col("mn") * -1) else (col("mn"), col("mx"))
    val ord = if (desc) col("key").desc else col("key").asc
    Prefix.exclusiveSum(
        df.crossJoin(broadcast(stat)),
        Prefix.rangeBin(binKey, lo, hi, parts),
        Seq(ord), col("mass"), "cb")
      .select("key", "cb")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  private def check(pairs: Seq[(Long, Long)], parts: Int, desc: Boolean = false): Unit = {
    val got = distributed(pairs, parts, desc)
    assert(got.size == pairs.size)
    var run = 0L
    val ordered = if (desc) pairs.sortBy(-_._1) else pairs.sortBy(_._1)
    ordered.foreach { case (k, m) =>
      assert(got(k) == run, s"key=$k parts=$parts desc=$desc")
      run += m
    }
  }

  private val relGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(1, 50)
    keys <- Gen.listOfN(n, Gen.choose(-1000000000000000L, 1000000000000000L))
    masses <- Gen.listOfN(n, Gen.choose(0L, 1000L))
  } yield keys.distinct.zip(masses)

  private val clusteredGen: Gen[Seq[(Long, Long)]] = for {
    n <- Gen.choose(1, 40)
    base <- Gen.choose(-1000L, 1000L)
    keys <- Gen.listOfN(n, Gen.choose(0L, 5L)) // tight range: most bins empty
    masses <- Gen.listOfN(n, Gen.choose(1L, 9L))
  } yield keys.map(base * 1000 + _).distinct.zip(masses)

  private def samples(g: Gen[Seq[(Long, Long)]], seed: Long, count: Int): List[Seq[(Long, Long)]] =
    Gen.listOfN(count, g).pureApply(Gen.Parameters.default, Seed(seed))

  test("two-pass prefix equals sequential scan on random relations, any bin count") {
    for {
      rel <- samples(relGen, 42L, 12) ++ samples(clusteredGen, 7L, 8)
      parts <- Seq(1, 4, 32)
    } check(rel, parts)
  }

  test("DESC order (the pp10 shape): negated bin key keeps pid monotone") {
    samples(relGen, 20260813L, 8).foreach(rel => check(rel, 8, desc = true))
  }

  test("single-key and single-row relations (mn == mx branch)") {
    check(Seq(5L -> 7L), 32)
    check(Seq(0L -> 0L), 1)
  }

  // ---- rankedIds (the tx6 vocabulary shape) ------------------------------
  // The fixture vocabulary is 31 words — too small to exercise multi-
  // partition ranking — so the primitive is driven here with a synthetic
  // zipf-ish relation: many ties on the primary key (the skew that defeats
  // value binning), uniqueness restored by the secondary key, DESC primary
  // order exactly as tx6 ranks (cnt DESC, w ASC).
  private def checkRanks(pairs: Seq[(Long, String)], parts: Int): Unit = {
    import spark.implicits._
    val got = Prefix.rankedIds(
        pairs.toDF("cnt", "w"),
        Seq(col("cnt").desc, col("w").asc), parts, "id")
      .select("w", "id")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = pairs.sortBy { case (c, w) => (-c, w) }
      .zipWithIndex.map { case ((_, w), i) => w -> (i + 1L) }.toMap
    assert(got == expected, s"parts=$parts n=${pairs.size}")
  }

  private val zipfGen: Gen[Seq[(Long, String)]] = for {
    n <- Gen.choose(1, 400)
    cnts <- Gen.listOfN(n, Gen.frequency(
      8 -> Gen.choose(5L, 8L),        // heavy tie-mass at the tail
      2 -> Gen.choose(9L, 100000L)))  // sparse head
  } yield cnts.zipWithIndex.map { case (c, i) => c -> s"w$i" }

  test("rankedIds equals sequential sort index on zipf-ish relations") {
    for {
      rel <- samples2(zipfGen, 99L, 8)
      parts <- Seq(1, 7, 32)
    } checkRanks(rel, parts)
  }

  private def samples2(g: Gen[Seq[(Long, String)]], seed: Long, count: Int): List[Seq[(Long, String)]] =
    Gen.listOfN(count, g).pureApply(Gen.Parameters.default, Seed(seed))
}
