package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property: the codegen'd Md5Bits64 kernel's derived helpers equal the
  * SQL built-ins formulation they replaced —
  * `conv(substr(md5(s), 1, 15), 16, 10)` for the 60-bit slice and
  * `conv(substr(md5(s), 16, 1), 16, 10)` for digit 16 — on adversarial
  * strings: empty, multi-byte unicode (md5 hashes the UTF-8 bytes on
  * both paths), long strings, decimal key shapes (the q24/q32/sm*
  * inputs), and NULL (both must be NULL). This is the kernel's
  * built-ins twin in the repo's standard pattern; the per-row oracle
  * hash-compare of every consumer is the corpus-scale version of the
  * same claim. */
class Md5Bits64PropSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private val alphabet = Gen.frequency(
    6 -> Gen.oneOf('0', '9', '5', '_'),
    3 -> Gen.alphaNumChar,
    1 -> Gen.oneOf('ó', 'ß', '漢', ' '))
  private val strGen: Gen[String] = for {
    n <- Gen.choose(0, 60)
    cs <- Gen.listOfN(n, alphabet)
  } yield cs.mkString

  test("md5Hex60/md5HexDigit16 equal their conv(substr(md5)) definitions") {
    import spark.implicits._
    val strings = Gen.listOfN(500, strGen)
      .pureApply(Gen.Parameters.default, Seed(11L)) ++
      Seq("", "0", "12345_6", "漢字漢字", "a" * 300)
    val df = strings.toDF("s")
    val disagree = df.select(
      graft.functions.PortableHash.md5Hex60("s").as("k60"),
      expr("CAST(conv(substr(md5(s), 1, 15), 16, 10) AS BIGINT)").as("r60"),
      graft.functions.PortableHash.md5HexDigit16("s").as("k16"),
      expr("CAST(conv(substr(md5(s), 16, 1), 16, 10) AS BIGINT)").as("r16"))
      .filter(col("k60") =!= col("r60") || col("k16") =!= col("r16"))
    assert(disagree.count() == 0, "kernel diverged from the built-ins definition")
    // NULL propagation: a null input must yield null on both paths
    val nulls = Seq[Option[String]](None, Some("x")).toDF("s")
      .select(graft.functions.PortableHash.md5Hex60("s").as("k60"))
    assert(nulls.filter(col("k60").isNull).count() == 1)
  }
}
