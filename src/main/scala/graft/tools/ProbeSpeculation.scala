package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.TaskContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerTaskStart}
import org.apache.spark.sql.SparkSession

/** Probe: can this environment run speculative execution at all?
  *
  * Spark's TaskSchedulerImpl starts the speculation thread only when NOT
  * in local mode, so proving "two racing attempts of one task commit one
  * consistent result" needs `local-cluster[n,cores,mem]` — real executor
  * JVMs forked from the SPARK_HOME distribution. This probe runs a tiny
  * job with one deliberate straggler (first attempt of one partition
  * sleeps; any speculative clone runs fast and WINS the commit race) and
  * prints whether speculative attempts launched and the job's result
  * stayed exact.
  *
  * RESULT (r11, recorded so nobody re-derives it): `local-cluster[2,4,*]`
  * runs real executors and the job completes exactly
  * (sum=499500), but speculative_started is ZERO and always will be on
  * one machine — TaskSetManager refuses to place a speculative attempt on
  * a HOST that already has a running attempt of the task
  * (dequeueSpeculativeTask's !hasAttemptOnHost guard), and every executor
  * a single-box cluster can offer shares that host. Speculation safety is
  * therefore covered by its equivalence class instead: attempt-identical
  * determinism (hard-zero nondeterministic expressions, PlanAudit +
  * ScanPruningSpec) plus executed attempt-0 kill/retry (the chaos tier) —
  * a speculative clone computes exactly what a retry computes; the only
  * uncovered machinery is the commit-race arbitration inside Spark's
  * OutputCommitCoordinator, which is not this library's code.
  */
object ProbeSpeculation {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("PROBE_MASTER", "local-cluster[2,4,2048]"))
      .config("spark.executor.extraClassPath", "/root/repo/target/scala-2.13/classes")
      .config("spark.speculation", "true")
      .config("spark.speculation.interval", "50ms")
      .config("spark.speculation.multiplier", "1.0")
      .config("spark.speculation.quantile", "0.25")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val specStarted = new AtomicLong
    val specWon = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskStart(e: SparkListenerTaskStart): Unit =
        if (e.taskInfo.speculative) specStarted.incrementAndGet()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        if (e.taskInfo.speculative && e.taskInfo.successful) specWon.incrementAndGet()
    })
    import spark.implicits._
    val sum = spark.range(0, 1000, 1, 20).as[Long].mapPartitions { it =>
      val tc = TaskContext.get()
      // one straggler, FIRST attempt only: the speculative clone is fast
      if (tc.partitionId() == 7 && tc.attemptNumber() == 0) Thread.sleep(8000)
      it
    }.reduce(_ + _)
    println(s"[probe-spec] sum=$sum (want 499500) speculative_started=${specStarted.get} " +
      s"speculative_won=${specWon.get}")
    spark.stop()
  }
}
