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

  // ---- renderLine: the bench-of-record JSON line (r13 verdict item 1) ----
  // BENCH_r13.json lost its per-query map because the calib field's 13
  // chars pushed the full line past a binary 1800 guard whose fallback
  // dropped EVERYTHING per-query. These pins guarantee the r14 contract:
  // at the REAL registry size with maximum realistic evidence the full
  // line fits, and when it can't fit, evidence degrades in tiers with the
  // queries map the last thing to go.

  /** The real registry's short codes — the exact keys Bench will emit. */
  private lazy val registryCodes: Seq[String] =
    SparkEntry.queries.keys.toSeq.sorted.map(_.takeWhile(_ != '_'))

  private def parseable(line: String): Boolean =
    line.startsWith("{") && line.endsWith("}") && !line.contains("\n")

  test("renderLine: full registry + calib + 10 retimed + 10 suspects + fam fits 1800 whole") {
    // adversarial-but-realistic values: every query at a 3-char 1-decimal
    // reading (9.9), retimed firsts at 2-digit magnitudes (the r13 spike
    // shape), a full 10-deep suspect list, and the fam flag
    val qs = registryCodes.map(_ -> 9.9)
    val rt = registryCodes.take(10).map(_ -> 68.0)
    val js = registryCodes.slice(10, 20).toList
    val line = Bench.renderLine(213.71, 1.30, qs, Seq.empty, rt, js,
      rereadErrors = 2, stFam = true, sfDir = "/root/testdata/sf0.1",
      calibEnd = 2.17, hostScale = 1.18, stFamilySec = 68.0)
    assert(line.length <= 1800, s"full-evidence line is ${line.length} chars")
    assert(parseable(line))
    assert(line.contains("\"st_family\":68.0"),
      "the r16 family key must survive the adversarial full tier")
    assert(line.contains("\"queries\":{") && line.contains("\"calib\":1.30"))
    assert(line.contains("\"calib_end\":2.17"))
    assert(line.contains("\"host_scale\":1.18"),
      "the applied re-time allowance must be readable from the artifact")
    assert(line.contains("\"retimed\":{") && line.contains("\"jitter_suspect\":["))
    assert(line.contains("\"fam\":1") && line.contains("\"reread_errors_n\":2"))
    assert(registryCodes.forall(c => line.contains("\"" + c + "\":")),
      "every registry code must appear in the full-tier queries map")
  }

  test("renderLine: st_family key rides with the fam flag and never inflates the total") {
    val qs = registryCodes.map(_ -> 9.9)
    val line = Bench.renderLine(213.71, 1.30, qs, Seq.empty, Seq.empty, Nil,
      rereadErrors = 0, stFam = true, sfDir = "/root/testdata/sf0.1",
      calibEnd = 2.17, hostScale = 1.18, stFamilySec = 12.3)
    assert(line.length <= 1800 && parseable(line))
    assert(line.contains("\"fam\":1,\"st_family\":12.3"),
      "the family wall-clock must be readable under its own key (r16)")
    // absent without the fam flag (solo runs) or with no st1 reading
    val solo = Bench.renderLine(3.0, 1.2, qs.take(3), Seq.empty, Seq.empty, Nil,
      rereadErrors = 0, stFam = false, sfDir = "x", stFamilySec = 12.3)
    val noSt1 = Bench.renderLine(3.0, 1.2, qs.take(3), Seq.empty, Seq.empty, Nil,
      rereadErrors = 0, stFam = true, sfDir = "x", stFamilySec = -1.0)
    assert(!solo.contains("st_family") && !noSt1.contains("st_family"))
  }

  test("renderLine: overflow degrades retimed/suspects to counts BEFORE dropping queries") {
    // stress-shaped values (3-digit seconds) + oversized evidence: the
    // full tier cannot fit, but the queries map must survive via tiering
    val qs = registryCodes.map(_ -> 999.9)
    val rt = registryCodes.take(30).map(_ -> 999.9)
    val js = registryCodes.slice(30, 60).toList
    val line = Bench.renderLine(9999.99, 2.50, qs, Seq.empty, rt, js,
      rereadErrors = 0, stFam = true, sfDir = "/root/testdata/sf0.1")
    assert(line.length <= 1800, s"degraded line is ${line.length} chars")
    assert(parseable(line))
    assert(line.contains("\"queries\":{"), "queries map must outlive the evidence maps")
    assert(line.contains("\"retimed_n\":30") && line.contains("\"jitter_suspect_n\":30"))
    assert(!line.contains("\"retimed\":{") && !line.contains("\"jitter_suspect\":["))
  }

  test("renderLine: queries drop only as the last resort, counts survive") {
    // r15 advisor fix: the bound is now UNCONDITIONAL — the final tier
    // carries only bounded counts and fixed-width numbers (errors map
    // degraded to errors_n, calib_end/host_scale dropped), so it provably
    // fits; the old last tier could still overflow on a 10-entry error map
    val qs = registryCodes.map(_ -> 9.9)
    val line = Bench.renderLine(100.0, 1.10, qs, (1 to 10).map(i => f"q$i%02d" -> ("x" * 40)),
      Seq("q01" -> 9.0), List("q02"), rereadErrors = 1, stFam = false,
      sfDir = "/root/testdata/sf0.1", budget = 200, calibEnd = 0.94,
      hostScale = 1.0)
    assert(line.length <= 200,
      s"the last tier must fit an impossible budget unconditionally (${line.length} chars)")
    assert(!line.contains("\"queries\":{"))
    assert(parseable(line))
    assert(line.contains("\"value\":100.00") && line.contains("\"calib\":1.10"))
    assert(line.contains("\"errors_n\":10") && !line.contains("\"errors\":{"),
      "the minimal tier degrades the error map to its count")
    assert(!line.contains("\"calib_end\":") && !line.contains("\"host_scale\":"),
      "the minimal tier drops the calibration extras")
    assert(line.contains("\"retimed_n\":1") && line.contains("\"jitter_suspect_n\":1"))
    assert(line.contains("\"reread_errors_n\":1"))
  }

  test("renderLine: errors map rides along; >10 errors degrade to errors_n") {
    val qs = Seq("q01" -> 1.0, "q02" -> 2.0)
    val few = Bench.renderLine(3.0, 1.2, qs, Seq("q02" -> "boom"),
      Seq.empty, Nil, 0, stFam = false, sfDir = "sf")
    assert(few.contains(""""errors":{"q02":"boom"}"""))
    val many = (1 to 11).map(i => f"q$i%02d" -> "boom")
    val capped = Bench.renderLine(3.0, 1.2, qs, many, Seq.empty, Nil, 0,
      stFam = false, sfDir = "sf")
    assert(capped.contains(""""errors_n":11""") && !capped.contains(""""errors":{"""))
  }
}
