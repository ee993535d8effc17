package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.expr

/** The engine-portable md5→integer idiom shared by the portable sketches
  * (simhash's h60, q24's HLL hash, q32's sample membership): the digest's
  * first 15 hex digits parsed as a 60-bit BIGINT. Load-bearing TEXT — every
  * DuckDB oracle re-derives the identical value with the per-digit strpos
  * parse ([[graft.Registry]].hexSlice), so the substr width and base here
  * must never drift per call site. The 64-hash MinHash family has its own
  * codegen'd kernel ([[MinhashKernel]]); this helper is for the
  * single-hash-per-row consumers built from SQL built-ins. */
object PortableHash {

  /** 60-bit value of md5(`input`)'s hex digits 1–15. `input` is a column
    * NAME (or SQL expression) interpolated into the expression text. */
  def md5Hex60(input: String): Column =
    expr(s"CAST(conv(substr(md5($input), 1, 15), 16, 10) AS BIGINT)")

  /** The 16th (last-of-16) hex digit of md5(`input`) — simhash's 4-bit
    * tail beyond the 60-bit slice. */
  def md5HexDigit16(input: String): Column =
    expr(s"CAST(conv(substr(md5($input), 16, 1), 16, 10) AS BIGINT)")
}
