package graft.sources

import org.apache.spark.sql.types._

/** The reference's backend-type → Arrow-type table, re-expressed as
  * backend-type → Spark Catalyst type (reference src/db/conversion.rs:1-68,
  * full analysis in SURVEY.md §1.3).
  *
  * The reference is *lossy by design* in two places we preserve for parity
  * (and document): PG `NUMERIC` and MySQL `NEWDECIMAL` map to Float64
  * (conversion.rs:18,39) rather than a decimal type, and MySQL `BLOB` maps
  * to Utf8 (conversion.rs:45). Every field is nullable — hardcoded `true` in
  * all three reference schema builders (src/db/sqlite.rs:62,
  * src/db/mysql.rs:75, src/db/postgresql.rs:74).
  *
  * For live JDBC reads this table would back a `JdbcDialect.getCatalystType`
  * override; offline (no driver jars, SURVEY.md §7.0) it is exercised by
  * unit tests and kept as the single source of truth for the mapping.
  */
object ReferenceTypeMap {

  /** PostgreSQL declared type → Spark type (conversion.rs:10-27). */
  def postgres(t: String): Option[DataType] = t.toUpperCase(java.util.Locale.ROOT) match {
    case "BOOL"      => Some(BooleanType)
    case "INT2"      => Some(ShortType)
    case "INT4"      => Some(IntegerType)
    case "FLOAT4"    => Some(FloatType)
    case "FLOAT8"    => Some(DoubleType)
    case "BIT"       => Some(BinaryType)
    case "NUMERIC"   => Some(DoubleType) // lossy, parity with conversion.rs:18
    case "DATE"      => Some(DateType)
    case "TIME"      => Some(IntegerType) // Time32(Second); Spark has no TIME
    case "VARCHAR"   => Some(StringType)
    case "TIMESTAMP" => Some(TimestampNTZType)
    case _           => None // reference panics `unimplemented!` (conversion.rs:24-26)
  }

  /** MySQL column type → Spark type (conversion.rs:29-50). */
  def mysql(t: String): Option[DataType] = t.toUpperCase(java.util.Locale.ROOT) match {
    case "INT24" | "LONG"                    => Some(IntegerType)
    case "FLOAT"                             => Some(DoubleType) // conversion.rs:36-38
    case "NEWDECIMAL"                        => Some(DoubleType) // lossy, conversion.rs:39
    case "TIMESTAMP"                         => Some(TimestampNTZType)
    case "VARCHAR" | "VAR_STRING" | "BLOB"   => Some(StringType) // BLOB-as-text, conversion.rs:45
    case _                                   => None
  }

  /** SQLite declared type → Spark type (conversion.rs:52-67). */
  def sqlite(t: String): Option[DataType] = t.toUpperCase(java.util.Locale.ROOT) match {
    case "INTEGER" => Some(LongType)
    case "TEXT"    => Some(StringType)
    case "REAL"    => Some(DoubleType)
    case "BLOB"    => Some(BinaryType)
    case "NULL"    => Some(NullType)
    case _         => None
  }

  /** All-nullable normalization: the reference hardcodes nullable=true for
    * every field of every schema it builds. Applied to reader-supplied
    * schemas when reference parity is requested.
    */
  def allNullable(schema: StructType): StructType =
    StructType(schema.fields.map(_.copy(nullable = true)))
}
