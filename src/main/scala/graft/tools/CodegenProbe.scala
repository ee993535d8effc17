package graft.tools

import org.apache.spark.metrics.source.CodegenMetrics
import org.apache.spark.sql.SparkSession

/** Janino-compilation accounting per registered query: runs each named
  * query with the bench's noop-write action and prints how many NEW
  * codegen compilations (whole-stage or expression) the run triggered and
  * the total time janino spent in them. The CodeGenerator cache is keyed on
  * generated SOURCE, so a repeated/iterated stage whose source is identical
  * compiles once — this probe is the "codegen-cache hit evidence" for
  * stable-shaped-kernel work (r16: PqArgminCells replacing per-iteration
  * centroid literals in ss4/ss6).
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.tools.CodegenProbe name…
  */
object CodegenProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def run(name: String): Unit =
      graft.Registry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      run("q01_pricing_summary")
    } catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[cgprobe] warm-up failed: $e")
    }
    args.foreach { n =>
      val c0 = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
      val t0 = CodegenMetrics.METRIC_COMPILATION_TIME.getSnapshot.getValues.sum
      val w0 = System.nanoTime()
      run(n)
      val wall = (System.nanoTime() - w0) / 1e9
      val c1 = CodegenMetrics.METRIC_COMPILATION_TIME.getCount
      println("CGPROBE %s compiles=%d wall=%.2f s".formatLocal(
        java.util.Locale.ROOT, n, c1 - c0, wall))
      val _ = t0 // snapshot values are reservoir-sampled; count is the signal
    }
    spark.stop()
  }
}
