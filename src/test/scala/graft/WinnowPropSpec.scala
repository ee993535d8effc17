package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.WinnowKernel

/** Property: the optimized winnowing kernel (ASCII byte fast-path, rolling
  * Mersenne-folded Karp–Rabin, monotonic-deque sliding min, sort+compact
  * dedup) equals a deliberately naive reference implementation (BigInt
  * Horner per gram — no custom modular arithmetic to share bugs with —
  * per-window scan min, Set dedup) on random strings — ASCII and
  * non-ASCII, lengths straddling the one-window boundary, and degenerate
  * repeated-char inputs. Generators are ScalaCheck with fixed seeds (the
  * scalatest-scalacheck bridge isn't in the offline cache).
  */
class WinnowPropSpec extends AnyFunSuite {

  /** Straight-line reference: Horner over each gram's code points in
    * BigInt (exercises the kernel's 64-bit mulmod/fold independently),
    * then min of each w-window by scanning. */
  private def naive(s: String, k: Int, w: Int): Set[Long] = {
    val codes = s.codePoints().toArray
    val n = codes.length - k + 1
    val m = n - w + 1
    if (m <= 0) return Set.empty
    val p = BigInt(WinnowKernel.P)
    val b = BigInt(WinnowKernel.Base)
    val hashes = (0 until n).map { i =>
      (0 until k).foldLeft(BigInt(0))((h, j) => (h * b + codes(i + j)) mod p).toLong
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

  test("mulmod equals BigInt modular multiplication on random 61-bit operands") {
    val rnd = new scala.util.Random(42)
    val p = BigInt(WinnowKernel.P)
    val edge = Seq(0L, 1L, 2L, WinnowKernel.P - 1, WinnowKernel.P - 2, (1L << 60) + 7)
    val pairs = edge.flatMap(a => edge.map(a -> _)) ++
      Seq.fill(5000)((rnd.nextLong(WinnowKernel.P), rnd.nextLong(WinnowKernel.P)))
    for ((a, b) <- pairs)
      assert(BigInt(WinnowKernel.mulmod(a, b)) == ((BigInt(a) * BigInt(b)) mod p), s"a=$a b=$b")
  }

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
