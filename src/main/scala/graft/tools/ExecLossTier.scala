package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Executor-LOSS tier (r12): kill -9 a REAL executor JVM mid-query on
  * `local-cluster[2,16,8192]` and record, per recovery class, what the
  * engine actually did. The r11 chaos tiers proved task-RETRY recovery
  * (in-task throws); this tier proves the harder fault a 1000-executor
  * cluster sees daily — a whole executor dying with its shuffle outputs
  * and cached blocks — against the library's two lineage shapes:
  *
  *  - pure-lineage rows (declarative plans, no pinned blocks): Spark
  *    re-schedules lost tasks, regenerates lost shuffle outputs via stage
  *    resubmission, and the row must come back EXACT — `recovered_exact`.
  *  - pin-severed rows (`Ckpt.pin`, default localCheckpoint): blocks on
  *    the dead executor are unrecoverable by design, so the CONTRACT is
  *    fail-fast-never-wrong: either the kill landed harmlessly (blocks
  *    elsewhere / already consumed → `recovered_exact`) or the query
  *    throws and a from-scratch rerun is exact — `failfast_rerun_exact`.
  *    The one outcome that must never appear is `WRONG` (silent result
  *    corruption after a loss).
  *  - the same pinned rows under `graft.reliableCkpt=true` (`Ckpt.pin` →
  *    reliable `checkpoint()`): checkpoint files live on the shared FS,
  *    not in executor memory, so the loss must recover in-query —
  *    `recovered_exact` expected even when the kill lands mid-iteration.
  *
  * Outcomes are judged against a no-kill baseline hash computed in the
  * same JVM/session first (behind a 2-executor readiness wait, so a
  * degraded post-kill cluster cannot inflate the fuse estimate). One
  * JSON line per (row, phase) is APPENDED to the artifact path in
  * arg(0) as it is produced — a mid-run abort loses nothing already
  * recorded (r12 review; default CORRECTNESS_execloss_r12.json).
  * Outcome vocabulary:
  *  - `kill_missed`: the query finished (hash-exact) before the fuse
  *    fired — honest non-evidence (r11 advisor), retried once with a
  *    shorter fuse;
  *  - `error_no_kill` / `wrong_no_kill`: the query FAILED (resp. hashed
  *    wrong) with no kill landed — genuine anomalies recorded with their
  *    evidence, never conflated with kill_missed (r12 review);
  *    terminal summaries distinguish `error_no_kill_twice` /
  *    `wrong_no_kill_twice` / `no_kill_landed_twice`;
  *  - `recovered_exact` / `failfast_rerun_exact` / `WRONG`: see above.
  */
object ExecLossTier {

  import ExecutorKill.{waitForExecutors, executorPids, Killer}

  /** Order-independent canonical hash of a small result. */
  private def resultHash(df: DataFrame): String = {
    val rows = df.collect().map(_.toString).sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach(r => md.update(r.getBytes("UTF-8")))
    java.util.Base64.getEncoder.encodeToString(md.digest())
  }

  def main(args: Array[String]): Unit = {
    val artifact = args.headOption.getOrElse("CORRECTNESS_execloss_r12.json")
    // sf0.1 by default: cluster-mode queries run seconds there, so the
    // mid-query kill has a real window to land even on the fast
    // pure-lineage rows (at sf0.01 q03/q10 complete in well under a
    // second warm and most kills would record kill_missed)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local-cluster[2,16,8192]"))
      .config("spark.executor.extraClassPath",
        sys.env.getOrElse("SPARK_GRAFT_EXEC_CLASSPATH",
          new java.io.File("target/scala-2.13/classes").getAbsolutePath))
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // (row, fn, pinned?) — two pure-lineage rows, three pin-severed rows
    // across the iterative families (LSH+CC candidates, Lloyd iterations,
    // BPE delta rounds), one streaming row (state stores + pinned drain).
    val rows: Seq[(String, (SparkSession, String) => DataFrame, Boolean)] = Seq(
      ("q03_top_revenue_orders", graft.SparkEntry.queries("q03_top_revenue_orders"), false),
      ("q10_grouping_sets", graft.SparkEntry.queries("q10_grouping_sets"), false),
      ("dd4_minhash_lsh", graft.SparkEntry.queries("dd4_minhash_lsh"), true),
      ("ss4_ivf_kmeans", graft.SparkEntry.queries("ss4_ivf_kmeans"), true),
      ("bp3_bpe_merges_distributed", graft.SparkEntry.queries("bp3_bpe_merges_distributed"), true),
      // direct call: bypasses the StFamily concurrent launcher (solo shape)
      ("st8_stream_closed_windows",
        (s: SparkSession, d: String) => graft.streaming.StreamingOps.closedTumblingFromStream(s, d),
        true))

    require(waitForExecutors(2), s"expected 2 executor JVMs, saw ${executorPids()}")

    // Append each record as it is produced: a require()-abort or fatal
    // error mid-run must not discard the minutes of evidence before it.
    val out = java.nio.file.Files.newBufferedWriter(
      java.nio.file.Paths.get(artifact),
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    def record(fields: (String, String)*): Unit = {
      val line = fields.map { case (k, v) => s""""$k": $v""" }.mkString("{", ", ", "}")
      println(s"[execloss] $line")
      out.write(line); out.newLine(); out.flush()
    }
    // sanitize EVERY control char (not just \n\r\t): a netty/shuffle error
    // text with a stray NUL or ANSI escape would make the artifact line
    // unparseable and zero the tier's evidence on a json.loads sweep
    def str(s: String) =
      "\"" + s.replaceAll("[\"\\\\\\p{Cntrl}]", " ") + "\""

    // OS-pid presence is necessary but not sufficient: a relaunched
    // CoarseGrainedExecutorBackend process exists before it has REGISTERED
    // with the driver and is schedulable — a baseline started in that
    // window runs on a degraded cluster and inflates the fuse estimate
    // (r12 review). statusTracker counts the driver too, hence n + 1.
    def waitForRegistered(n: Int, timeoutMs: Long = 120000): Boolean = {
      val deadline = System.currentTimeMillis() + timeoutMs
      while (spark.sparkContext.statusTracker.getExecutorInfos.length < n + 1 &&
          System.currentTimeMillis() < deadline)
        Thread.sleep(500)
      spark.sparkContext.statusTracker.getExecutorInfos.length >= n + 1
    }
    def ready(where: String): Unit = {
      require(waitForExecutors(2), s"executor JVMs did not respawn before $where")
      require(waitForRegistered(2), s"executors did not re-register before $where")
    }

    def runWithKill(name: String, fn: (SparkSession, String) => DataFrame,
                    fuseMs: Long): (Either[String, String], Boolean) = {
      ready("kill run")
      val killer = new Killer(fuseMs, name)
      killer.start()
      val res =
        try Right(resultHash(fn(spark, sfDir)))
        catch { case e: Throwable =>
          Left(Option(e.getMessage).getOrElse(e.getClass.getName).take(120))
        }
      val doneAt = System.nanoTime()
      killer.cancel() // a finished query needs no post-job kill (r12 review)
      killer.join(fuseMs + 5000)
      (res, killer.landedBefore(doneAt))
    }

    /** One (row, phase): up to two kill attempts against `baseline`,
      * shrinking the fuse after a missed kill; the same judging policy
      * for both the local_ckpt and reliable_ckpt phases (r12 review —
      * previously two hand-synced copies of this loop). */
    def runPhase(name: String, phase: String,
                 fn: (SparkSession, String) => DataFrame,
                 baseline: String, fuse0: Long,
                 extra: Seq[(String, String)]): Unit = {
      var fuse = fuse0
      var attempt = 0
      var done = false
      var sawError = false
      var sawWrong = false
      while (!done && attempt < 2) {
        attempt += 1
        runWithKill(name, fn, fuse) match {
          case (Right(h), false) if h == baseline =>
            // finished (correctly) before the fuse fired: honest
            // non-evidence for the kill claim
            record(Seq("query" -> str(name), "phase" -> str(phase),
              "outcome" -> str("kill_missed"), "attempt" -> attempt.toString): _*)
            fuse = math.max(200L, fuse / 3) // shorter fuse, try once more
          case (Right(_), false) =>
            // finished before the fuse AND hashed wrong: a genuine
            // wrong-result anomaly with NO fault injected — the one
            // thing that must never hide behind a kill_missed label
            sawWrong = true
            record(Seq("query" -> str(name), "phase" -> str(phase),
              "outcome" -> str("wrong_no_kill"), "attempt" -> attempt.toString): _*)
          case (Left(err), false) =>
            // FAILED with no kill landed: a genuine anomaly, never to be
            // conflated with kill_missed — record the error and retry
            sawError = true
            record(Seq("query" -> str(name), "phase" -> str(phase),
              "outcome" -> str("error_no_kill"), "attempt" -> attempt.toString,
              "error" -> str(err)): _*)
          case (Right(h), true) =>
            record((Seq("query" -> str(name), "phase" -> str(phase),
              "outcome" -> str(if (h == baseline) "recovered_exact" else "WRONG"),
              "attempt" -> attempt.toString) ++ extra): _*)
            done = true
          case (Left(err), true) =>
            // fail-fast half of the contract: the rerun (executors
            // recovered) must be exact from scratch
            ready("rerun")
            val rerun = resultHash(fn(spark, sfDir))
            record((Seq("query" -> str(name), "phase" -> str(phase),
              "outcome" -> str(if (rerun == baseline) "failfast_rerun_exact" else "WRONG"),
              "attempt" -> attempt.toString, "error" -> str(err)) ++ extra): _*)
            done = true
        }
      }
      // terminal summary must not file a real anomaly under a
      // missed-kill label (r12 review)
      if (!done)
        record(Seq("query" -> str(name), "phase" -> str(phase),
          "outcome" -> str(
            if (sawWrong) "wrong_no_kill_twice"
            else if (sawError) "error_no_kill_twice"
            else "no_kill_landed_twice")): _*)
    }

    try rows.foreach { case (name, fn, pinned) =>
      // no-kill baseline in this same session (also warms codegen/scans
      // so the kill run's duration estimate below is steady-state) —
      // behind the same 2-executor readiness wait as the kill runs, so a
      // cluster still recovering from the previous row's kill cannot
      // inflate baseSec and overshoot the fuse (r12 review)
      ready("baseline")
      val t0 = System.nanoTime()
      val baseline = resultHash(fn(spark, sfDir))
      val baseSec = (System.nanoTime() - t0) / 1e9
      val fuse = math.max(500L, (baseSec * 1000 * 0.4).toLong)
      runPhase(name, "local_ckpt", fn, baseline, fuse,
        Seq("pinned" -> pinned.toString))

      // reliable-checkpoint phase for the pinned rows: same kill, but
      // Ckpt.pin now writes checkpoint files to the shared FS — the
      // in-query loss-tolerance switch RUNBOOK documents, exercised
      if (pinned && name != "st8_stream_closed_windows") {
        sys.props("graft.reliableCkpt") = "true"
        try {
          ready("reliable baseline")
          val base2 = resultHash(fn(spark, sfDir))
          record(Seq("query" -> str(name), "phase" -> str("reliable_ckpt_baseline"),
            "outcome" -> str(if (base2 == baseline) "flag_identical" else "WRONG")): _*)
          runPhase(name, "reliable_ckpt", fn, baseline, fuse, Seq.empty)
        } finally sys.props.remove("graft.reliableCkpt")
      }
    } finally out.close()

    println(s"[execloss] artifact -> $artifact")
    spark.stop()
  }
}
