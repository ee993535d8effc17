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

  private def tiny(session: SparkSession): Unit = {
    import org.apache.spark.sql.functions.{col, window}
    val dir = java.nio.file.Files.createTempDirectory("graft-rdbconf-probe").toFile
    val in = new java.io.File(dir, "in")
    session.range(100)
      .selectExpr("id", "timestamp_micros(id * 1000000) AS ts")
      .write.parquet(in.getPath)
    session.readStream.schema("id BIGINT, ts TIMESTAMP").parquet(in.getPath)
      .withWatermark("ts", "1 minute")
      .groupBy(window(col("ts"), "1 minute")).count()
      .writeStream.format("noop")
      .option("checkpointLocation", new java.io.File(dir, "ckpt").getPath)
      .outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
      .awaitTermination()
  }

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
        if (texts.toLowerCase.contains("changelog") || texts.contains(Changelog))
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
