package graft

import org.scalatest.funsuite.AnyFunSuite

/** Integrity guard for the recorded plan-shape artifact
  * (PLANAUDIT_rN.json): PlanAudit's typed-node walk must count exchanges
  * exactly like ShuffleBudgetSpec's regex-over-toString method — the
  * walk descends AQE's initialPlan, and a Spark upgrade or a walk bug
  * that silently diverged the two (the r10 first draft walked
  * `inputPlan`, which predates exchange insertion and reads ZERO
  * everywhere) would make the artifact understate shuffles while the CI
  * budgets still passed. Since r11 the walk collects `subqueries` from
  * EVERY node (QueryPlan.subqueries is per-node, not recursive), so the
  * cross-check includes subquery-BEARING queries: toString renders
  * subqueries as innerChildren, and a walk that only descended
  * root-level subqueries would undercount exchanges for a scalar
  * subquery hanging off a deep Filter while the regex counted it. */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private val names = Seq(
    "q01_pricing_summary", "q03_top_revenue_orders",
    "dd10_tfidf_cosine", "ev13_scd2_history", "sm2_fixed_size_sample",
    // subquery-bearing: correlated scalar (q30), avg-qty scalar (q46),
    // EXISTS chain (q47) — non-root expression subqueries exercise the
    // r11 walk-coverage fix (subqueries collected from every node)
    "q30_correlated_subquery", "q46_avgqty_subquery", "q47_exists_chain")

  test("artifact exchange counts match the budget spec's regex method") {
    names.foreach { n =>
      val plan = Registry.queries(n)(spark, sf).queryExecution.executedPlan
      val viaWalk = graft.tools.PlanAudit.exchangeCount(plan)
      val viaRegex =
        "Exchange (hashpartitioning|rangepartitioning|SinglePartition)".r
          .findAllIn(plan.toString).length
      assert(viaWalk == viaRegex,
        s"$n: walk counts $viaWalk exchanges, regex counts $viaRegex — " +
          "the PLANAUDIT artifact and ShuffleBudgetSpec have diverged")
      assert(viaWalk > 0, s"$n: zero exchanges counted — the walk is " +
        "reading a pre-EnsureRequirements plan (the inputPlan bug)")
    }
  }
}
