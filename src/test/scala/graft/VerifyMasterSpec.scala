package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the chaos master-rewrite rules (`Verify.chaosMaster`) — the
  * r12-review fix for the class where an un-rewritten local master
  * leaves task maxFailures at 1 and every injected first-attempt
  * failure fails the job outright. Local mode reads retries ONLY from
  * the master-string suffix, so every local form must carry >=3 when
  * chaos is on; non-local masters must pass through untouched (there
  * the `spark.task.maxFailures` conf is authoritative and set
  * separately). */
class VerifyMasterSpec extends AnyFunSuite {

  test("chaos on: every local form is rewritten to carry maxFailures 3") {
    assert(Verify.chaosMaster("local", chaos = true) == "local[1,3]")
    assert(Verify.chaosMaster("local[4]", chaos = true) == "local[4,3]")
    assert(Verify.chaosMaster("local[32]", chaos = true) == "local[32,3]")
    assert(Verify.chaosMaster("local[*]", chaos = true) == "local[*,3]")
    assert(Verify.chaosMaster("local[4,1]", chaos = true) == "local[4,3]")
    assert(Verify.chaosMaster("local[4,2]", chaos = true) == "local[4,3]")
    // Spark's LOCAL_N_FAILURES_REGEX allows whitespace around the comma
    assert(Verify.chaosMaster("local[4, 1]", chaos = true) == "local[4,3]")
    assert(Verify.chaosMaster("local[* , 2]", chaos = true) == "local[*,3]")
  }

  test("chaos on: an already-retry-tolerant suffix is preserved, not lowered") {
    assert(Verify.chaosMaster("local[4,3]", chaos = true) == "local[4,3]")
    assert(Verify.chaosMaster("local[8,5]", chaos = true) == "local[8,5]")
  }

  test("chaos on: non-local masters pass through (conf is authoritative there)") {
    assert(Verify.chaosMaster("local-cluster[2,16,8192]", chaos = true)
      == "local-cluster[2,16,8192]")
    assert(Verify.chaosMaster("spark://host:7077", chaos = true)
      == "spark://host:7077")
  }

  test("chaos off: every master passes through untouched") {
    for (m <- Seq("local", "local[4]", "local[*]", "local[4,1]",
        "local-cluster[2,16,8192]", "spark://host:7077"))
      assert(Verify.chaosMaster(m, chaos = false) == m)
  }
}
