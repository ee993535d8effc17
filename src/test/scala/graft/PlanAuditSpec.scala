package graft

import org.scalatest.funsuite.AnyFunSuite

/** Integrity guard for the recorded plan-shape artifact
  * (PLANAUDIT_rN.json): PlanAudit's typed-node walk must count exchanges
  * exactly like ShuffleBudgetSpec's regex-over-toString method — the
  * walk descends AQE's initialPlan, and a Spark upgrade or a walk bug
  * that silently diverged the two (the r10 first draft walked
  * `inputPlan`, which predates exchange insertion and reads ZERO
  * everywhere) would make the artifact understate shuffles while the CI
  * budgets still passed. Queries chosen without expression subqueries
  * (toString renders the main tree; the walk also descends subqueries,
  * so subquery-bearing plans may legitimately differ). */
class PlanAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private val names = Seq(
    "q01_pricing_summary", "q03_top_revenue_orders",
    "dd10_tfidf_cosine", "ev13_scd2_history", "sm2_fixed_size_sample")

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
