package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm up the JVM/codegen/scan paths once so per-query numbers reflect
    // steady state rather than first-query class-loading; queries run in
    // name order for run-to-run comparability.
    // The timed action is a noop-format write, not count(): under count()
    // Catalyst prunes unreferenced projections and drops top-level sorts, so
    // e.g. q02's revenue column was never computed — noop executes the full
    // plan (every column, every sort) and discards rows at the sink.
    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Unit =
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      SparkEntry.queries.get("q01_pricing_summary").foreach(run)
    } catch { case _: Throwable => () }
    // A query that throws must not masquerade as a fast success: its timing
    // is recorded NEGATIVE (time-to-failure) and its name+message land in an
    // "errors" object, excluded from the total.
    var errors = Map.empty[String, String]
    // Optional isolation harness: SPARK_GRAFT_ONLY=tx6,tx7 retimes a subset
    // under the exact same warmup/noop-write methodology as the full run —
    // used for variance-vs-regression audits (BASELINE.md), never by the
    // driver (unset ⇒ full registry).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name.takeWhile(_ != '_'))) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try { run(fn); true }
        catch {
          case e: Throwable =>
            errors += name -> Option(e.getMessage).getOrElse(e.getClass.getName).take(80)
            false
        }
      val sec = (System.nanoTime() - t0) / 1e9
      name -> (if (ok) sec else -sec)
    }
    // The driver parses the LAST 2000 chars of sbt output, and the JSON line
    // must fit there WHOLE (r01–r03 all recorded parsed:null; even 2-decimal
    // full-name keys were ~3.7k chars for 80+ queries). Keys are therefore
    // the unambiguous short codes (q01, dd4, …) — the prefix before the first
    // underscore, unique across the registry — keeping the line under ~1.2k.
    def fmt(v: Double): String = BigDecimal(v).setScale(2, BigDecimal.RoundingMode.HALF_UP).toString
    def code(n: String): String = n.takeWhile(_ != '_')
    require(results.map(r => code(r._1)).distinct.size == results.size,
      "short query codes must stay unique for the bench JSON")
    val qs = results.map { case (k, v) => "\"" + code(k) + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val errJson =
      if (errors.isEmpty) ""
      else errors.map { case (k, v) => "\"" + code(k) + "\":\"" + v.replaceAll("[\"\\\\\\n\\r\\t]", " ").take(40) + "\"" }
        .mkString(""","errors":{""", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    val line = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs$errJson,"sf":"$sfDir"}"""
    // Last-resort guard: if the registry ever grows the line past the tail
    // window, drop per-query detail rather than emit an unparseable line.
    println(if (line.length <= 1800) line
            else s"""{"metric":"total","value":${fmt(total)},"unit":"sec","sf":"$sfDir"}""")
    spark.stop()
  }
}
