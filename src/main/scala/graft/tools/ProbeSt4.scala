package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe: run st4's harness once and dump per-batch streaming
  * progress (durationMs breakdown + state operator metrics) — names where
  * the wall-clock goes. Not part of any gate; safe to delete. */
object ProbeSt4 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/stress")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      def onQueryStarted(e: QueryStartedEvent): Unit = ()
      def onQueryProgress(e: QueryProgressEvent): Unit =
        println("PROGRESS " + e.progress.json)
      def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    val t0 = System.nanoTime()
    graft.streaming.StreamingOps.intervalPairsFromStream(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    println("TOTAL %.2f s".formatLocal(java.util.Locale.ROOT, (System.nanoTime() - t0) / 1e9))
    spark.stop()
  }
}
