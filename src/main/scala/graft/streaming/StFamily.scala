package graft.streaming

import java.util.concurrent.Executors

import scala.collection.concurrent.TrieMap
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration
import scala.util.Try

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Concurrent launcher for the eight registered streaming rows (st1–st8).
  *
  * Why it exists: each st row is a full Structured Streaming harness —
  * stage input files, start a query, run 3–48 micro-batches, drain a sink —
  * and pays a fixed ~3–5 s of trigger/commit machinery that tmpfs A/Bs
  * proved is planning overhead, not storage or data cost. Run back to back
  * (the r09 shape) the family paid 8 × that floor ≈ 31–36 s of the whole
  * sf0.1 bench. The floors OVERLAP when the queries run concurrently —
  * st6's two internal AvailableNow queries proved it (6.9 → 5.1 s sf0.1) —
  * and a production deployment runs exactly this way: one cluster, many
  * independent streaming queries sharing executors, not a serial chain.
  *
  * Mechanics: the FIRST st row requested for a corpus launches all eight
  * members concurrently, each on its own `spark.newSession()` child (so
  * per-query `spark.sql.shuffle.partitions` scoping — a start-time state
  * property — cannot cross-talk) and its own staging/checkpoint trees,
  * then caches each member's fully-materialized result (every member
  * `localCheckpoint`s before returning). Subsequent rows collect their
  * cached result. Entries are SINGLE-SHOT (removed on fetch): a repeat
  * invocation of any row — Bench's outlier re-time, a second Verify pass —
  * re-runs the whole family live rather than reading a stale cache, so no
  * timing or correctness path ever observes a result it did not pay for.
  *
  * Timing attribution (Bench runs rows alphabetically): st1 carries the
  * family launch — its reading IS the family's concurrent wall-clock —
  * and st2–st8 read as the cache fetch (~0.05 s each). The family TOTAL in
  * the bench is therefore the real end-to-end cost of producing all eight
  * results once, same as before, just not serialized. RefSeconds reflects
  * this attribution.
  *
  * `SPARK_GRAFT_ST_SOLO=1` bypasses the launcher entirely (each row runs
  * standalone on the parent session) — used by TimeQuery to isolate one
  * row's own mechanism, and by A/B audits of the launcher itself.
  *
  * Failure isolation: a member that throws caches its Failure; the rows
  * that didn't fail stay green, and the failing row's exception surfaces
  * on ITS fetch — per-row error semantics in Bench/Verify are unchanged.
  */
object StFamily {

  val members: Map[String, (SparkSession, String) => DataFrame] = Map(
    "st1" -> StreamingOps.dedupIngestKeepList _,
    "st2" -> StreamingOps.sessionizationFromStream _,
    "st3" -> StreamingOps.closedSessionsFromStream _,
    "st4" -> StreamingOps.intervalPairsFromStream _,
    "st5" -> StreamingOps.forwardFillFromStream _,
    "st6" -> StreamingOps.lshPairsFromStream _,
    "st7" -> StreamingOps.dedupWithinWatermarkFromStream _,
    "st8" -> StreamingOps.closedTumblingFromStream _)

  /** Registry adapter: the function registered for streaming row `code`. */
  def row(code: String): (SparkSession, String) => DataFrame = {
    require(members.contains(code), s"unknown streaming row $code")
    (s: SparkSession, d: String) => fetch(s, d, code)
  }

  private def solo: Boolean = sys.env.contains("SPARK_GRAFT_ST_SOLO")

  private val cache = TrieMap.empty[(String, String), Try[DataFrame]]

  // 8 long-lived await-ers, one per member; actual parallelism comes from
  // Spark's scheduler underneath. Daemon threads so the pool never blocks
  // JVM exit.
  private lazy val pool: ExecutionContext = ExecutionContext.fromExecutorService(
    Executors.newFixedThreadPool(members.size, (r: Runnable) => {
      val t = new Thread(r, "graft-st-family")
      t.setDaemon(true)
      t
    }))

  private def fetch(s: SparkSession, d: String, code: String): DataFrame = {
    if (solo) return members(code)(s, d)
    takeOrRun(s, d, code, attempts = 0).get
  }

  /** Remove-then-run loop: runFamily always (re)produces every missing
    * member, but a CONCURRENT fetch of the same (dir, code) can steal the
    * entry between this thread's runFamily and its remove — the launcher
    * is explicitly built for concurrent use, so that interleaving must
    * retry (re-running the family for the stolen row), not error. The
    * attempt bound only guards a pathological livelock (more concurrent
    * stealers of one row than attempts, every single race lost); each
    * retry that loses did still produce seven OTHER cached rows, so
    * forward progress for the family as a whole is preserved. */
  @annotation.tailrec
  private def takeOrRun(s: SparkSession, d: String, code: String,
                        attempts: Int): Try[DataFrame] =
    cache.remove((d, code)) match {
      case Some(r) => r
      case None =>
        require(attempts < 8,
          s"family run did not produce $code after $attempts attempts " +
            "(lost every concurrent-steal race)")
        runFamily(s, d)
        takeOrRun(s, d, code, attempts + 1)
    }

  /** Launch every member whose result is not already cached, concurrently,
    * and cache the results. Launching only the MISSING members matters
    * beyond economy: consumers that fetch a subset of rows (the plan-shape
    * spec sweeps exclude st1) leave the others' entries behind, and a
    * later fetch must re-produce the consumed rows rather than see a
    * leftover and conclude the family already ran (the r10 bug: an
    * any-entry-for-this-dir guard returned without producing the requested
    * row). The synchronized block makes a concurrent first-fetch from two
    * threads run one family launch, not two. */
  private def runFamily(s: SparkSession, d: String): Unit = synchronized {
    val missing = members.toSeq.filter { case (code, _) => !cache.contains((d, code)) }
    if (missing.isEmpty) return // another thread already ran it
    implicit val ec: ExecutionContext = pool
    val t0 = System.nanoTime()
    val launched = missing.map { case (code, fn) =>
      code -> Future {
        val r = Try(fn(s.newSession(), d))
        // per-member completion offset from family launch: the family's
        // wall-clock is max(member), so this names the critical-path member
        println("[stfamily] %s done at +%.2f s".formatLocal(java.util.Locale.ROOT,
          code, (System.nanoTime() - t0) / 1e9))
        r
      }
    }
    launched.foreach { case (code, f) =>
      cache((d, code)) = Await.result(f, Duration.Inf)
    }
  }
}
