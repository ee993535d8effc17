package graft.tools

import org.apache.spark.sql.SparkSession

/** Liveness probe for RocksDB state-store SUB-confs (r13): the provider
  * class itself is proven live by the bogus-class probe (ExecLossStTier /
  * the r12 strocksdb tier), but provider-specific settings like
  * `spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled`
  * are parsed by RocksDBConf at state-store init, NOT validated as
  * registered SQLConf entries at set time — a typo'd key is silently
  * ignored. This probe runs one tiny stateful query per case and prints
  * whether (a) a deliberately malformed value FAILS the query by naming
  * the conf (proof the key is read), and (b) the real `true` value runs
  * green. Usage: runMain graft.tools.ProbeRocksdbConf
  */
object ProbeRocksdbConf {

  private val Provider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
  private val Changelog =
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"

  // probe body shared via StatefulProbe (r13 review: one implementation)
  private def tiny(session: SparkSession): Unit = StatefulProbe.run(session)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val bogus = spark.newSession()
    bogus.conf.set("spark.sql.streaming.stateStore.providerClass", Provider)
    bogus.conf.set(Changelog, "notabool")
    val bogusOutcome =
      try { tiny(bogus); "VACUOUS: malformed value ran green — conf key not read" }
      catch { case e: Throwable =>
        val texts = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
          .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
        if (texts.toLowerCase(java.util.Locale.ROOT).contains("changelog") || texts.contains(Changelog))
          "conf_live: malformed value failed naming the conf"
        else s"failed WITHOUT naming the conf: ${texts.take(200)}"
      }
    println(s"[probe-rdbconf] bogus-value: $bogusOutcome")

    val real = spark.newSession()
    real.conf.set("spark.sql.streaming.stateStore.providerClass", Provider)
    real.conf.set(Changelog, "true")
    val realOutcome =
      try { tiny(real); "green" }
      catch { case e: Throwable => s"FAILED: ${Option(e.getMessage).getOrElse("")}".take(200) }
    println(s"[probe-rdbconf] true-value: $realOutcome")
    spark.stop()
  }
}
