package graft

import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WinnowKernel

/** Property: the optimized winnowing kernel (ASCII byte fast-path,
  * monotonic-deque sliding min, sort+compact dedup) equals a deliberately
  * naive reference implementation (char-based substrings, per-window scan
  * min, Set dedup) on random strings — ASCII and non-ASCII, lengths
  * straddling the one-window boundary, and degenerate repeated-char
  * inputs. Generators are ScalaCheck with fixed seeds (the
  * scalatest-scalacheck bridge isn't in the offline cache).
  */
class WinnowPropSpec extends AnyFunSuite {

  /** Straight-line reference: hash every k-gram via the same XXH64-of-UTF8
    * family, then min of each w-window by scanning. */
  private def naive(s: String, k: Int, w: Int): Set[Long] = {
    val n = s.length - k + 1
    val m = n - w + 1
    if (m <= 0) return Set.empty
    val hashes = (0 until n).map { i =>
      val sub = UTF8String.fromString(s.substring(i, i + k))
      XXH64.hashUnsafeBytes(sub.getBaseObject, sub.getBaseOffset, sub.numBytes, 42L)
    }
    (0 until m).map(j => (j until j + w).map(hashes).min).toSet
  }

  private def kernel(s: String, k: Int, w: Int): Set[Long] =
    WinnowKernel.winnow(UTF8String.fromString(s), k, w).toLongArray().toSet

  private val asciiGen: Gen[String] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, Gen.oneOf(('a' to 'e') :+ ' ')).map(_.mkString))
  private val unicodeGen: Gen[String] =
    Gen.choose(0, 30).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'é', 'ß', '中', ' ')).map(_.mkString))
  private val degenerateGen: Gen[String] =
    Gen.choose(0, 30).map("x" * _)

  private def samples(g: Gen[String], seed: Long, count: Int): List[String] =
    Gen.listOfN(count, g).pureApply(Gen.Parameters.default, Seed(seed))

  test("kernel equals naive winnowing on random ascii/unicode/degenerate strings") {
    val cases =
      samples(asciiGen, 42L, 200) ++
        samples(unicodeGen, 7L, 200) ++
        samples(degenerateGen, 20260812L, 40)
    for {
      s <- cases
      (k, w) <- Seq((5, 4), (3, 2), (1, 1), (2, 5))
    } assert(kernel(s, k, w) == naive(s, k, w), s"text='$s' k=$k w=$w")
  }
}
