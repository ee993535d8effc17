package graft.tools

import org.apache.spark.sql.SparkSession

/** Probe: executor LOSS recovery on a real multi-executor cluster.
  *
  * `local-cluster[2,8,3072]` forks two executor JVMs; this probe runs a
  * two-stage job (slowed map stage → shuffle → aggregate) whose answer
  * has a closed form, and a background thread kill -9s ONE executor
  * process mid-map-stage. Spark must then: mark the executor lost, fail
  * its running tasks (not counted toward task-failure limits), discover
  * the dead executor's shuffle outputs are gone (FetchFailed), resubmit
  * the map stage for the lost partitions on the surviving/replacement
  * executor (the standalone Master relaunches one), and still produce
  * the exact answer. This is the recovery machinery a 1000-executor job
  * leans on daily, and the one fault mode the chaos tier (in-task
  * throws) cannot reach. Prints the killed pid, the relaunch evidence
  * (executor pids before/after) and the exactness verdict.
  *
  * Deliberately NOT a per-round artifact over the registry: the
  * eager-construction operators pin intermediates with localCheckpoint,
  * whose blocks are not replicated — an executor loss there fails the
  * query by design (RUNBOOK documents the reliable-checkpoint switch for
  * deployments needing in-query loss tolerance). The probe proves the
  * ENGINE-level recovery path; the library's plans add no
  * placement-dependent state beyond those documented sites.
  */
object ProbeExecutorLoss {

  // pid scan / kill machinery shared with ExecLossTier (r12 review:
  // previously two hand-synced copies)
  import ExecutorKill.{executorPids, Killer}

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("PROBE_MASTER", "local-cluster[2,8,3072]"))
      .config("spark.executor.extraClassPath",
        new java.io.File("target/scala-2.13/classes").getAbsolutePath)
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val n = 200000L
    val expected = n * (n - 1) / 2

    // wait for both executors, then snapshot
    var before = Seq.empty[Long]
    val deadline = System.currentTimeMillis() + 60000
    while (before.size < 2 && System.currentTimeMillis() < deadline) {
      Thread.sleep(500); before = executorPids()
    }
    require(before.size >= 2, s"expected 2 executor JVMs, saw $before")

    // aim mid-map-stage (map stage runs ~8 s)
    val killer = new Killer(3000, "probe")
    killer.start()

    // slowed map stage (64 tasks × ~150 ms) → shuffle → sum: the kill
    // lands while map outputs are accumulating on both executors, so
    // recovery must recompute the dead executor's partitions
    val total = spark.range(0, n, 1, 64).as[Long]
      .mapPartitions { it => Thread.sleep(150); it }
      .groupByKey(_ % 97).mapValues(identity).reduceGroups(_ + _)
      .map(_._2).reduce(_ + _)
    val jobDoneNanos = System.nanoTime()

    killer.join(1000)
    val after = executorPids()
    // The kill must land BEFORE the job completes (r11 advisor: a fixed
    // sleep on a fast map stage could kill after the answer was already
    // in hand, silently weakening the proof to "killed>0") — assert the
    // ordering instead of trusting the sleep.
    val landedMidJob = killer.landedBefore(jobDoneNanos)
    val ok = total == expected && landedMidJob
    println(s"[probe-exec-loss] sum=$total (want $expected) killed_pid=${killer.killedPid} " +
      s"kill_before_job_end=$landedMidJob " +
      s"executors_before=${before.mkString(",")} executors_after=${after.mkString(",")} " +
      (if (ok) "EXACT-AFTER-EXECUTOR-LOSS" else "NOT PROVEN"))
    spark.stop()
  }
}
