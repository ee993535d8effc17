package graft.tools

import org.apache.spark.sql.SparkSession

/** Times individual registered queries with the bench's noop-write action
  * (after one warm-up query) — the single-query iteration loop for perf
  * work. Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.TimeQuery name…
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // SPARK_GRAFT_PARTS decouples shuffle partitions from the thread count
    // for scale probes: the bench pins partitions=cpus (the sf0.1 contract),
    // but at 1000x data that leaves ~19M rows per shuffle partition and the
    // sorts/aggs go spill-bound — a cluster sizes partitions with data (or
    // lets AQE coalesce DOWN from a high initial count), and this knob
    // measures exactly that effect on one query at a time.
    val parts = sys.env.get("SPARK_GRAFT_PARTS")
      .flatMap(v => scala.util.Try(v.toInt).toOption).getOrElse(cpus.toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", parts.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      graft.Registry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // NonFatal only: a broken fixture dir / misconfigured session should
    // surface here, not silently proceed to timings of cold-start noise —
    // and OOM/fatal JVM errors must never be swallowed
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      run("q01_pricing_summary")
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[timeq] warm-up failed (timings may be cold): $e")
    }
    args.foreach(n => println("TIMEQ %s %.2f s".formatLocal(java.util.Locale.ROOT, n, run(n))))
    spark.stop()
  }
}
