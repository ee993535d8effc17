package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** Chaos must compose with ANY master: local mode reads task retries
    * from the master-string suffix (the `spark.task.maxFailures` conf is
    * ignored there), so every local form — bare `local`, `local[N]`,
    * `local[*]`, and `local[N,F]` with F<3 — is rewritten to carry
    * maxFailures 3 when injection is on. Non-local masters pass through
    * (the conf is authoritative and set separately). Pinned by
    * VerifyMasterSpec. */
  private[graft] def chaosMaster(raw: String, chaos: Boolean): String = {
    val LocalN = """local\[(\d+|\*)\]""".r
    // whitespace around the comma mirrors Spark's own
    // LOCAL_N_FAILURES_REGEX — "local[4, 1]" is a valid master and must
    // be rewritten too (r12 review)
    val LocalNF = """local\[(\d+|\*)\s*,\s*(\d+)\]""".r
    raw match {
      case "local" if chaos => "local[1,3]"
      case LocalN(n) if chaos => s"local[$n,3]"
      case LocalNF(n, f) if chaos && f.toInt < 3 => s"local[$n,3]"
      case m => m
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // Chaos tier (SPARK_GRAFT_CHAOS, see Tables.injectChaos): first
    // attempts of ~20% of source tasks throw, so the master must allow
    // retries — local[N,3] (maxFailures 3: one injected failure + margin).
    // SPARK_GRAFT_ST_CHAOS (r12 tier) injects INSIDE stateful micro-batch
    // tasks (StreamingOps.injectStChaos) — same retry-tolerance and
    // listener needs as batch chaos, so the two flags share the plumbing.
    val chaos = sys.env.contains("SPARK_GRAFT_CHAOS") ||
      sys.env.contains("SPARK_GRAFT_ST_CHAOS")
    // Cluster tier (SPARK_GRAFT_MASTER, e.g. local-cluster[2,16,6144]):
    // run the whole registry across REAL executor JVMs — serialization of
    // every task closure/kernel over RPC, broadcasts and shuffles over
    // netty, state stores and localCheckpoint blocks on remote executors —
    // the multi-executor surface local[N] structurally cannot exercise.
    // Needs SPARK_SCALA_VERSION=2.13 in the env (the executor launcher
    // resolves its classpath without the shell scripts) and ships the
    // library to executors via extraClassPath. In cluster form retry
    // tolerance is a conf, not a master-string suffix, so chaos composes.
    val masterRaw = sys.env.getOrElse("SPARK_GRAFT_MASTER",
      if (chaos) s"local[$cpus,3]" else s"local[$cpus]")
    // An explicit local master would leave maxFailures at the local
    // default of 1, failing every injected first attempt outright (r11
    // advisor) — see chaosMaster above for the rewrite rules.
    val master = chaosMaster(masterRaw, chaos)
    val builder = SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (chaos) builder.config("spark.task.maxFailures", "3")
    if (master.startsWith("local-cluster")) {
      builder.config("spark.executor.extraClassPath",
        sys.env.getOrElse("SPARK_GRAFT_EXEC_CLASSPATH",
          new java.io.File("target/scala-2.13/classes").getAbsolutePath))
    }
    // Tier plumbing: SPARK_GRAFT_CONF_<spark.conf.key>=<value> env vars
    // become session confs verbatim — context-start confs a tier needs
    // (e.g. the spill tier starves execution memory with
    // env 'SPARK_GRAFT_CONF_spark.memory.fraction=0.15') without a
    // bespoke flag per conf. Applied LAST — after every fixed conf,
    // including the local-cluster extraClassPath default — so an
    // explicitly-set env var always wins: the config-robustness tiers
    // re-run the registry under a different shuffle-partition count /
    // AQE off / broadcasts disabled and require hash-identical results.
    sys.env.foreach { case (k, v) =>
      if (k.startsWith("SPARK_GRAFT_CONF_"))
        builder.config(k.stripPrefix("SPARK_GRAFT_CONF_"), v)
    }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Provenance for invariance tiers (r14): the JVM-defaults tier re-runs
    // the registry under a hostile default locale + timezone (tr-TR /
    // non-UTC) and needs in-artifact evidence the options actually reached
    // the forked JVM — without this line a vacuous run (options silently
    // dropped) would read as a passing tier.
    println(s"[verify] jvm_defaults locale=${java.util.Locale.getDefault}" +
      s" tz=${java.util.TimeZone.getDefault.getID}" +
      s" session_tz=${spark.conf.get("spark.sql.session.timeZone")}")
    // Non-vacuity evidence for the chaos tier: count injected failures and
    // the successful second attempts, printed at the end — a chaos run
    // that recorded zero retried tasks proved nothing.
    val (chaosFailures, chaosRetriedOk) =
      (new java.util.concurrent.atomic.AtomicLong, new java.util.concurrent.atomic.AtomicLong)
    if (chaos) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          e.reason match {
            case f: org.apache.spark.ExceptionFailure
                if f.description.contains("graft-chaos") => chaosFailures.incrementAndGet()
            case _ =>
              if (e.taskInfo != null && e.taskInfo.successful && e.taskInfo.attemptNumber > 0)
                chaosRetriedOk.incrementAndGet()
          }
        }
      })
    // Spill tier (SPARK_GRAFT_SPILL_REPORT=1): non-vacuity evidence that a
    // memory-starved run actually spilled — a "correct under pressure" tier
    // where nothing spilled proved only that the pressure knob was too
    // loose. Totals from executed task metrics, printed at the end.
    val spillReport = sys.env.contains("SPARK_GRAFT_SPILL_REPORT")
    val (spillMem, spillDisk) =
      (new java.util.concurrent.atomic.AtomicLong, new java.util.concurrent.atomic.AtomicLong)
    if (spillReport) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskMetrics != null) {
            spillMem.addAndGet(e.taskMetrics.memoryBytesSpilled)
            spillDisk.addAndGet(e.taskMetrics.diskBytesSpilled)
          }
      })
    // Speculation tier (SPARK_GRAFT_SPEC_REPORT=1, r13): evidence that the
    // speculation scheduler was genuinely armed for the run. The conf is
    // context-start, so it is read back from the LIVE SparkConf (a typo'd
    // passthrough would print false and flag the tier vacuous). Speculative
    // ATTEMPT counts are also recorded, with the known structural caveat:
    // on one machine TaskSetManager never places a speculative clone (the
    // dequeueSpeculativeTask !hasAttemptOnHost guard — ProbeSpeculation
    // documents this with an executed straggler probe), so armed-with-zero-
    // placed is the expected honest reading, and the tier's value is that
    // the speculation machinery (speculatable-task scanning inside
    // TaskSetManager on every interval tick) ran against all 134 queries
    // without perturbing results.
    val specReport = sys.env.contains("SPARK_GRAFT_SPEC_REPORT")
    val (specStarted, specWon) =
      (new java.util.concurrent.atomic.AtomicLong, new java.util.concurrent.atomic.AtomicLong)
    if (specReport) spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onTaskStart(e: org.apache.spark.scheduler.SparkListenerTaskStart): Unit =
          if (e.taskInfo != null && e.taskInfo.speculative) specStarted.incrementAndGet()
        override def onTaskEnd(e: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
          if (e.taskInfo != null && e.taskInfo.speculative && e.taskInfo.successful)
            specWon.incrementAndGet()
      })
    new java.io.File(outDir).mkdirs()
    // local-iteration aid: SPARK_GRAFT_ONLY=q48,tx6 restricts the dump to
    // matching query names (comma-separated prefixes); unset = full run,
    // which is what the driver does
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    def wanted(name: String): Boolean =
      only.forall(_.exists(p => name.startsWith(p)))
    // Supplementary per-query timing (r13 verdict item 8): the seconds each
    // dump took, written as <outDir>_VERIFYTIME.json BESIDE outDir (see
    // the sibling-path note at the write site below — a file inside
    // outDir would be swept up as a failed rows-only query). A second,
    // harness-independent per-query timing record immune to the bench
    // line-budget — SUPPORTING evidence only (the dump action is
    // coalesce(1)+parquet, not the bench's noop write, so absolute values
    // differ from BENCH; same-corpus cross-round ratios are the use).
    var dumpSecs = List.empty[(String, Double)]
    SparkEntry.queries.filter(kv => wanted(kv._1)).foreach { case (name, fn) =>
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        dumpSecs ::= name -> (System.nanoTime() - t0) / 1e9
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    // SIBLING path, deliberately outside outDir: the correctness checker
    // enumerates outDir/* as query dumps (tools/check.py's rows-only
    // sweep — and the driver's checker does the same), so a metadata file
    // INSIDE outDir would be recorded as a failed rows-only query.
    def fmt(v: Double) = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    Files.writeString(Paths.get(s"${outDir.stripSuffix("/")}_VERIFYTIME.json"),
      dumpSecs.sortBy(_._1).map { case (k, v) => s"${q(k)}: ${fmt(v)}" }
        .mkString("{", ",", "}"))
    if (chaos)
      println(s"[chaos] injected_failures=${chaosFailures.get} retried_ok=${chaosRetriedOk.get}" +
        (if (chaosFailures.get == 0) " — VACUOUS: no task was actually killed" else ""))
    if (spillReport)
      println(s"[spill] memory_spilled_bytes=${spillMem.get} disk_spilled_bytes=${spillDisk.get}" +
        (if (spillDisk.get == 0) " — VACUOUS: nothing spilled, tighten the pressure" else ""))
    if (specReport) {
      val armed = spark.sparkContext.getConf.getBoolean("spark.speculation", false)
      println(s"[speculation] armed=$armed" +
        s" multiplier=${spark.sparkContext.getConf.get("spark.speculation.multiplier", "unset")}" +
        s" quantile=${spark.sparkContext.getConf.get("spark.speculation.quantile", "unset")}" +
        s" speculative_started=${specStarted.get} speculative_won=${specWon.get}" +
        (if (!armed) " — VACUOUS: spark.speculation did not reach the scheduler" else
          " (zero placed is expected on one host: dequeueSpeculativeTask's" +
            " !hasAttemptOnHost guard — see ProbeSpeculation)"))
    }
    spark.stop()
  }
}
