package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.{StFamily, StreamingOps}

/** Contracts of the concurrent streaming-family launcher (r10):
  *
  *  1. family results ≡ standalone results — the launcher changes
  *     scheduling (child sessions, concurrency, single-shot caching),
  *     never data;
  *  2. the partial-consumption relaunch: a consumer that fetches a SUBSET
  *     of rows leaves the others' entries behind, and a later fetch of a
  *     consumed row must re-produce it live. Pinned as a regression test:
  *     the first launcher guarded on any-entry-for-this-corpus and died
  *     with "family run did not produce stN" on exactly the sweep pattern
  *     the plan-shape specs run (consume st2–st8, leave st1, fetch again).
  */
class StFamilySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("family-produced rows equal the standalone member results") {
    // family fetch first (one concurrent launch behind the scenes) …
    val viaFamily = rows(StFamily.row("st2")(spark, sf))
    // … then the member standalone on the parent session
    val solo = rows(StreamingOps.sessionizationFromStream(spark, sf))
    assert(solo.nonEmpty && viaFamily == solo)
  }

  test("a consumed row is re-produced after a partial-consumption sweep") {
    // consume every member EXCEPT st1 — the plan-shape-sweep pattern that
    // leaves st1's entry cached for this corpus
    val first = rows(StFamily.row("st2")(spark, sf))
    Seq("st3", "st4", "st5", "st6", "st7", "st8")
      .foreach(c => StFamily.row(c)(spark, sf).count())
    // st2 was consumed; with st1's entry still present, the buggy
    // any-entry guard returned without producing st2 and this fetch threw
    val again = rows(StFamily.row("st2")(spark, sf))
    assert(first.nonEmpty && again == first)
    // drain the leftovers so this suite leaves no cross-suite cache state
    // (the relaunch re-produced st3–st8 and st1 is still cached from the
    // first launch; consuming all seven empties the cache for this corpus)
    Seq("st1", "st3", "st4", "st5", "st6", "st7", "st8")
      .foreach(c => StFamily.row(c)(spark, sf).count())
  }

  test("concurrent fetches of the same row all succeed and agree (steal-race retry, r11)") {
    // Four threads fetch the SAME single-shot row: one launches the family
    // and the rest race it (and each other) for the one cache entry —
    // exactly the interleaving where the pre-r11 fetch threw "family run
    // did not produce st7" after losing a steal between its runFamily and
    // its second remove. The retry loop must hand EVERY thread a result,
    // each one paid for by a (re-)produced member run, and all equal.
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
    try {
      val fetched = (1 to 4)
        .map(_ => Future(rows(StFamily.row("st7")(spark, sf))))
        .map(Await.result(_, Duration.Inf))
      assert(fetched.head.nonEmpty && fetched.forall(_ == fetched.head))
    } finally pool.shutdown()
    // drain the seven untouched members' entries left by the launch
    Seq("st1", "st2", "st3", "st4", "st5", "st6", "st8")
      .foreach(c => StFamily.row(c)(spark, sf).count())
  }
}
