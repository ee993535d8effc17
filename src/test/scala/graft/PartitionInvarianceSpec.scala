package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partitioning invariance — the CI contract behind the engine's central
  * 100 TB determinism claim: a query's RESULT must not depend on how many
  * partitions the shuffle used, because at cluster scale the partition
  * count is an ops knob (AQE, cluster width), not a semantic input.
  *
  * Mechanism: `newSession()` shares the SparkContext but carries its own
  * SQLConf, so the same plans run under a different
  * `spark.sql.shuffle.partitions` (1 — everything in one task — and 13, a
  * prime that never divides evenly into key domains) and must produce
  * bit-identical rows. The query set is the float-arithmetic-bearing one,
  * where naive implementations DO drift under re-partitioning (double
  * accumulation order changes): decimal power-sum statistics (q41), the
  * two-pass median/MAD (ev18), decimal-exact TF-IDF dots (dd10), the
  * per-user EWMA fold (ev16), surprisal/cross-entropy sums (tx9/tx10),
  * float rescoring (ss7), the doc-granular prefix selection (pp12), and
  * the three r06 oracle conversions: float32 payload histograms (mm1),
  * the cosine ranking over them (mm4), and the scaled-integer fixed-point
  * PageRank iteration (gr1) — fixed point exists precisely so the result
  * is partition-count-independent; this is that claim as CI — plus the
  * two r07 portable sketches: the md5-register HLL (q24, exact integer
  * register sums make the estimator order-free) and the hash-sample
  * percentile (q32, content-hashed membership + rank-selected
  * interpolation). Integer-shaped q01 anchors the suite.
  */
class PartitionInvarianceSpec extends AnyFunSuite {
  private lazy val base = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private val queries = Seq(
    "q01_pricing_summary", "q41_corr_stats", "ev16_ewma", "ev18_mad_anomaly",
    "dd10_tfidf_cosine", "tx9_token_surprisal", "tx10_bigram_crossent",
    "ss7_exact_rescore", "pp12_token_budget", "ev19_time_weighted_avg",
    "mm1_media_features", "mm4_media_neardup", "gr1_neardup_pagerank",
    "q24_approx_count_distinct", "q32_approx_percentiles")

  private def rows(name: String)(configure: org.apache.spark.sql.SparkSession => Unit)
      : Seq[String] = {
    val s = base.newSession()
    configure(s)
    Registry.queries(name)(s, sf).collect().map(_.toString).sorted.toSeq
  }

  queries.foreach { name =>
    test(s"$name is bit-identical under shuffle.partitions 1, 4, 13 and with AQE off") {
      val at4 = Registry.queries(name)(base, sf).collect().map(_.toString).sorted.toSeq
      assert(at4.nonEmpty)
      assert(rows(name)(_.conf.set("spark.sql.shuffle.partitions", "1")) == at4,
        s"$name drifts at partitions=1")
      assert(rows(name)(_.conf.set("spark.sql.shuffle.partitions", "13")) == at4,
        s"$name drifts at partitions=13")
      // AQE re-plans shuffles at runtime (coalescing, join flips, skew
      // splits) — none of which may change RESULTS
      assert(rows(name)(_.conf.set("spark.sql.adaptive.enabled", "false")) == at4,
        s"$name drifts with AQE disabled")
    }
  }
}
