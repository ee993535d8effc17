package graft.sources

import java.io.File

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Source-URL dispatch.
  *
  * The reference picks a connector from the text before the first ':' in the
  * database URL (reference src/lib.rs:47-65; the sqlite arm additionally
  * strips a `sqlite://` prefix at src/lib.rs:59) and then forwards the SQL
  * text verbatim to that backend (src/main.rs:29 → src/lib.rs:37-43 →
  * e.g. src/db/mysql.rs:91). Spark-side, each scheme configures a
  * `DataFrameReader`; relational backends use the JDBC source with
  * whole-query pushdown (`option("query", …)`), which is the exact analogue
  * of the reference's pass-through. File-backed schemes register each table
  * file as a temp view and let Spark SQL supply the relational algebra the
  * reference outsources to MySQL/PG/SQLite.
  */
sealed trait Source {
  /** Execute `query` against this source and return the result, lazily. */
  def load(spark: SparkSession, query: String): DataFrame
}

object Source {

  /** Directory of table files; each file becomes a temp view named after its
    * basename, then the query runs on Spark SQL. This is the scale path: the
    * scan splits per file/row-group across executors, with predicate
    * pushdown and column pruning from Catalyst — unlike the reference's
    * single-connection, one-row-per-batch stream
    * (reference src/db/mysql.rs:85-110).
    */
  final case class Files(format: String, dir: String) extends Source {
    def load(spark: SparkSession, query: String): DataFrame = {
      registerViews(spark)
      spark.sql(query)
    }

    def registerViews(spark: SparkSession): Unit = {
      graft.Tables.ensureNanosReadable(spark)
      val ext = "." + format
      val files = Option(new File(dir).listFiles()).getOrElse(Array.empty[File])
        .filter(_.getName.toLowerCase.endsWith(ext))
      require(files.nonEmpty, s"no *$ext files under $dir")
      files.sortBy(_.getName).foreach { f =>
        val name = f.getName.dropRight(ext.length)
        val reader = format match {
          // header-on matches the reference's CSV sink default
          // (reference src/lib.rs:114-123), making round-trips symmetric.
          case "csv" => spark.read.option("header", "true").option("inferSchema", "true")
          case _     => spark.read
        }
        graft.Tables.normalizeNanos(reader.format(format).load(f.getAbsolutePath))
          .createOrReplaceTempView(name)
      }
    }
  }

  /** JDBC source with whole-query pushdown (reference S1/S2/S3,
    * src/db/{mysql,postgresql,sqlite}.rs). The full SQL string is executed by
    * the backend — the analogue of `conn.query_iter(query)`
    * (src/db/mysql.rs:91). `partitionOptions` exposes Spark's partitioned
    * JDBC read (partitionColumn/lowerBound/upperBound/numPartitions) so a
    * large extract parallelizes across executors instead of the reference's
    * single connection.
    *
    * Note: no JDBC driver jars ship in this offline environment, so this
    * path is covered by dispatch/unit tests only (SURVEY.md §7.0).
    */
  final case class Jdbc(
      url: String,
      driver: Option[String],
      partitionOptions: Map[String, String] = Map.empty) extends Source {
    def load(spark: SparkSession, query: String): DataFrame = {
      val base = spark.read.format("jdbc")
        .option("url", url)
        .option("query", query)
        .options(partitionOptions)
      driver.fold(base)(d => base.option("driver", d)).load()
    }
  }

  /** Scheme = text before the first ':' (reference src/lib.rs:50-64). */
  def fromUrl(url: String): Source = {
    val scheme = url.takeWhile(_ != ':').toLowerCase
    val rest = url.drop(scheme.length + 1) match {
      case r if r.startsWith("//") => r.drop(2)
      case r => r
    }
    scheme match {
      case "parquet" | "orc" | "csv" | "json" => Files(scheme, "/" + rest.dropWhile(_ == '/'))
      case "mysql" => Jdbc(s"jdbc:mysql://$rest", Some("com.mysql.cj.jdbc.Driver"))
      case "postgres" | "postgresql" => Jdbc(s"jdbc:postgresql://$rest", Some("org.postgresql.Driver"))
      // the reference strips the scheme and opens the remainder as a file
      // path (src/lib.rs:59, src/db/sqlite.rs:71)
      case "sqlite" => Jdbc(s"jdbc:sqlite:/${rest.dropWhile(_ == '/')}", Some("org.sqlite.JDBC"))
      case "jdbc" => Jdbc(url, None)
      case other => throw new IllegalArgumentException(
        s"Unsupported database URL scheme '$other' in: $url")
    }
  }
}
