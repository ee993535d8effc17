package graft

import org.scalatest.funsuite.AnyFunSuite

/** Interpreted ≡ codegen for every custom kernel, as CI.
  *
  * Each custom Catalyst expression here ships two execution paths: the
  * generated code (`doGenCode`) that the hot path runs, and the
  * interpreted `nullSafeEval` that Spark silently falls back to when a
  * stage exceeds codegen limits (method size, nested plans) or codegen is
  * disabled operationally. Both delegate to the same static kernel
  * method, so divergence can only creep in through the marshalling
  * around that call (nullability, boxing, reference objects) — exactly
  * the seam a unit test of the kernel function cannot see.
  *
  * Mechanism: run every kernel-bearing registry query once normally and
  * once with whole-stage codegen off AND the expression codegen factory
  * forced to NO_CODEGEN (wholeStage=false alone still compiles
  * individual expressions), and require bit-identical rows.
  */
class CodegenFallbackSpec extends AnyFunSuite {
  private lazy val base = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  // every query whose plan carries a custom expression, one per kernel:
  // Md5Bits64 (dd5/q24/q32), MinhashSignature (dd4), WinnowFingerprints
  // (dd7), BpeEncode (bp2), CmsProbeAtLeast (hh1), BloomMightContainString
  // (bf1), CountOccurrences (tx7), FloatVectorDot (ss1)
  private val queries = Seq(
    "dd4_minhash_lsh", "dd5_simhash_pairs", "dd7_winnow_fingerprints",
    "bp2_bpe_encode", "hh1_heavy_hitters", "bf1_bloom_decontaminate",
    "tx7_charngram_langid", "ss1_topk_bruteforce",
    "q24_approx_count_distinct", "q32_approx_percentiles")

  queries.foreach { name =>
    test(s"$name is bit-identical with codegen disabled (interpreted kernels)") {
      val hot = Registry.queries(name)(base, sf)
        .collect().map(_.toString).sorted.toSeq
      assert(hot.nonEmpty)
      val s = base.newSession()
      s.conf.set("spark.sql.codegen.wholeStage", "false")
      s.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interpreted = Registry.queries(name)(s, sf)
        .collect().map(_.toString).sorted.toSeq
      assert(interpreted == hot, s"$name drifts under interpreted evaluation")
    }
  }
}
