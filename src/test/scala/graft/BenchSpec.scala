package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins Bench.retimePolicy — the escalating min-of-N re-time rule the r12
  * bench breach motivated (BASELINE.md: min-of-2 kept tx5 at 22.04 s
  * against a 0.40 s floor because BOTH readings were host-jittered; the
  * 10x stress corpus read the same HEAD at 1.19 s). No SparkSession
  * needed: the policy is pure, taking readings as a thunk. */
class BenchSpec extends AnyFunSuite {

  /** A scripted re-read source that records how many reads were taken. */
  private class Reads(vals: Double*) {
    private val it = vals.iterator
    var taken = 0
    def next(): Double = { taken += 1; it.next() }
  }

  test("a reading within 2x ref is kept untouched with zero re-reads") {
    val r = new Reads()
    val (best, discarded, suspect) = Bench.retimePolicy(1.9, 1.0, canRetime = true, r.next)
    assert(best == 1.9 && discarded.isEmpty && !suspect && r.taken == 0)
  }

  test("the absolute 1.5 s floor protects sub-second-ref queries from pointless re-reads") {
    val r = new Reads()
    // 1.4 s on a 0.2 s ref is 7x but under the floor — noise on a tiny
    // query, not worth a re-run
    val (best, _, suspect) = Bench.retimePolicy(1.4, 0.2, canRetime = true, r.next)
    assert(best == 1.4 && !suspect && r.taken == 0)
  }

  test("min-of-2: one re-read when >2x ref, improved reading kept, first recorded") {
    val r = new Reads(0.9)
    val (best, discarded, suspect) = Bench.retimePolicy(2.5, 1.0, canRetime = true, r.next)
    assert(best == 0.9 && discarded.contains(2.5) && !suspect && r.taken == 1)
  }

  test("no escalation when min-of-2 lands at/below 5x ref") {
    val r = new Reads(4.0, 99.0)
    val (best, _, suspect) = Bench.retimePolicy(8.0, 1.0, canRetime = true, r.next)
    assert(best == 4.0 && !suspect && r.taken == 1)
  }

  test("escalation: both early readings jittered, third read recovers the floor (the r12 tx5 shape)") {
    // tx5 shape scaled: first 53.9, re-read 22.04 — min-of-2 would have
    // recorded 22.04 against a 0.40 ref; the escalation keeps reading
    val r = new Reads(22.04, 0.45)
    val (best, discarded, suspect) = Bench.retimePolicy(53.9, 0.40, canRetime = true, r.next)
    assert(best == 0.45 && discarded.contains(53.9) && !suspect && r.taken == 2)
  }

  test("read budget is bounded at 4 total and a persistent outlier is marked jitter-suspect") {
    val r = new Reads(21.0, 22.0, 23.0)
    val (best, discarded, suspect) = Bench.retimePolicy(20.0, 0.5, canRetime = true, r.next)
    assert(best == 20.0 && discarded.isEmpty && suspect && r.taken == 3)
  }

  test("a genuine slowdown that reproduces across reads is kept AND marked, not silently discounted") {
    val r = new Reads(6.1, 6.0, 6.2)
    val (best, _, suspect) = Bench.retimePolicy(6.3, 1.0, canRetime = true, r.next)
    assert(best == 6.0 && suspect && r.taken == 3)
  }

  test("canRetime=false (st cache fetches) takes zero re-reads but still marks a >5x row") {
    val r = new Reads()
    val (best, discarded, suspect) = Bench.retimePolicy(3.0, 0.5, canRetime = false, r.next)
    assert(best == 3.0 && discarded.isEmpty && suspect && r.taken == 0)
  }

  test("negative (error) first reading: untouched, never re-read, never suspect") {
    val r = new Reads()
    val (best, discarded, suspect) = Bench.retimePolicy(-4.2, 0.5, canRetime = true, r.next)
    assert(best == -4.2 && discarded.isEmpty && !suspect && r.taken == 0)
  }

  test("negative (error) re-read is never a minimum candidate and stops the escalation") {
    // a query that succeeded once and then FAILS on re-run signals a
    // degrading host: the first reading stands and the remaining read
    // budget is not burned on it (r13 review)
    val r = new Reads(-0.1, -0.2, -0.3)
    val (best, discarded, suspect) = Bench.retimePolicy(9.0, 1.0, canRetime = true, r.next)
    assert(best == 9.0 && discarded.isEmpty && suspect && r.taken == 1)
  }

  test("a failed re-read mid-escalation keeps the best reading found so far") {
    val r = new Reads(7.0, -1.0, 0.4)
    val (best, discarded, suspect) = Bench.retimePolicy(20.0, 1.0, canRetime = true, r.next)
    assert(best == 7.0 && discarded.contains(20.0) && suspect && r.taken == 2)
  }
}
