package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-corpus table access. One parquet file per table under a
  * scale-factor directory (see TESTDATA.md). Parquet is self-describing,
  * so unlike the reference's per-backend schema mapping
  * (reference src/db/conversion.rs:1-68) no type plumbing is needed here —
  * Spark's parquet reader supplies the schema and pushes filters/pruning
  * into the scan.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Spark 4 refuses parquet TIMESTAMP(NANOS) columns outright
    * ([PARQUET_TYPE_ILLEGAL]); with this legacy conf they read as raw
    * nanosecond longs instead, which `apply` rebuilds into a µs timestamp.
    * Runtime-settable, so it also works on a driver-owned session. */
  def ensureNanosReadable(spark: SparkSession): Unit =
    try spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    catch { case _: Throwable => () }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    ensureNanosReadable(spark)
    normalizeNanos(spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Rebuild a nanosAsLong-read `ts` column into a µs timestamp. The ns → µs
    * truncation is exactly what DuckDB does reading the same file, so oracle
    * comparisons on ts-derived values stay bit-exact. Applied on every read
    * path (Tables and the engine's view registration) so `ts` has one type
    * everywhere. */
  def normalizeNanos(df: DataFrame): DataFrame =
    df.schema.fields.find(f => f.name == "ts" && f.dataType == org.apache.spark.sql.types.LongType)
      .map(_ => df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts DIV 1000)")))
      .getOrElse(df)

  /** Register every table in `dir` as a temp view so `spark.sql` queries
    * (the engine's verbatim-SQL path, ≈ reference src/main.rs:29) resolve.
    */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
