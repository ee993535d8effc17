package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

/** One-off empirical probe (not part of the library surface): how does the
  * session_window store treat a row BELOW the current watermark? Prints the
  * per-batch watermark and row counts so the late-data contract in
  * StreamingSpec is written against observed Spark 4.1.2 behavior, the same
  * method that pinned st3's inclusive/ms-floored emission semantics. */
object ProbeLate {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("probe-late").master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("probe-late-").toFile
    val t0 = 1767225600000000L
    val mn = 60L * 1000000L
    def mk(rows: Seq[(Long, Long)], i: Int): Unit =
      rows.toDF("user_id", "us")
        .select(col("user_id"), timestamp_micros(col("us")).as("ts"))
        .coalesce(1).write.parquet(s"$base/" + "c%02d.parquet".formatLocal(java.util.Locale.ROOT, i))
    mk(Seq((1L, t0), (1L, t0 + 10 * mn)), 0)
    mk(Seq((1L, t0 + 5 * mn), (2L, t0 + 400 * mn)), 1)
    mk(Seq((2L, t0 + 500 * mn)), 2)
    // too-late row now arrives TWO batches after the advance that outdates
    // it: late-events wm for batch 3 = eviction wm of batch 2 = t0+280m
    mk(Seq((1L, t0 + 100 * mn), (2L, t0 + 800 * mn)), 3)
    val schema = spark.read.parquet(s"$base/c00.parquet").schema
    val stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1)
      .parquet(s"$base/*.parquet/*.parquet")
    val agg = stream
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("s_start"), col("w.end").as("s_end"), col("n_events"))
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("probe_late")
      .trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.recentProgress.foreach { p =>
      println(s"[probe] batch=${p.batchId} rowsIn=${p.numInputRows} " +
        s"wm=${p.eventTime.get("watermark")} max=${p.eventTime.get("max")} " +
        s"stateRows=${p.stateOperators.headOption.map(_.numRowsTotal)} " +
        s"lateDropped=${p.stateOperators.headOption.map(_.numRowsDroppedByWatermark)}")
    }
    q.stop()
    spark.table("probe_late").orderBy("user_id", "s_start").show(20, false)
    org.apache.commons.io.FileUtils.deleteDirectory(base)
    spark.stop()
  }
}
