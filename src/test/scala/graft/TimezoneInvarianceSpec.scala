package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The read-path timezone claim as CI.
  *
  * `Tables.normalizeTimestamps` promises that the stored instants a table
  * yields do NOT depend on `spark.sql.session.timeZone` — load-bearing
  * because the NTZ branch rewrites wall-clock micros via `timestampdiff`
  * from the NTZ epoch (session-zone-independent) where a bare
  * NTZ→TIMESTAMP cast would read the session zone and shift every
  * instant. The engine's own mains pin UTC, but a driver-owned or
  * user-owned session may run in any zone; a silent zone-dependent read
  * would corrupt every downstream window/as-of/session computation while
  * still LOOKING plausible.
  *
  * Mechanism: `newSession()` carries its own SQLConf; the same reads run
  * under UTC, a negative-offset zone and a positive-offset zone, and the
  * microsecond content must be identical. A raw-expression probe per
  * timestamped table pins the read itself; an end-to-end event query
  * (ev2 sessionization — lag/gap arithmetic over the read instants) pins
  * that the independence survives a full operator pipeline.
  *
  * (Queries whose SEMANTICS are zone-defined — date_trunc buckets, day
  * grouping — are intentionally out of scope: for those the engine pins
  * UTC in its session builders, which is a different, documented
  * contract.) */
class TimezoneInvarianceSpec extends AnyFunSuite {
  private lazy val base = SparkTestSession.spark
  private val sf = SparkTestSession.sf

  private val zones = Seq("UTC", "America/New_York", "Asia/Tokyo")

  private def inZone[A](zone: String)(f: org.apache.spark.sql.SparkSession => A): A = {
    val s = base.newSession()
    s.conf.set("spark.sql.session.timeZone", zone)
    f(s)
  }

  test("every timestamped table reads the identical instants in any session timezone") {
    for (table <- Seq("events", "orders", "lineitem")) {
      val probes = zones.map { z =>
        inZone(z) { s =>
          val df = Tables(s, sf, table)
          val tsCols = df.schema.fields
            .filter(_.dataType == org.apache.spark.sql.types.TimestampType)
            .map(_.name)
          assert(tsCols.nonEmpty, s"$table has no timestamp columns — probe is vacuous")
          // DECIMAL(38,0), not a raw long sum: lineitem's per-row micros
          // triple already sums to ~4.8e18 at sf0.001, so a LongType sum
          // overflows (and under this build's ANSI default, throws) as soon
          // as the test SF is raised
          df.agg(
            count(lit(1)).as("n"),
            sum(tsCols.map(c => unix_micros(col(c))).reduce(_ + _)
              .cast("decimal(38,0)")).as("us_sum"))
            .collect()(0).toString
        }
      }
      assert(probes.distinct.size == 1,
        s"$table reads zone-dependent instants: ${zones.zip(probes)}")
    }
  }

  test("ev2 sessionization is bit-identical in any session timezone") {
    val results = zones.map { z =>
      inZone(z)(s => Registry.queries("ev2_sessionization")(s, sf)
        .collect().map(_.toString).sorted.toSeq)
    }
    assert(results.head.nonEmpty)
    assert(results.distinct.size == 1, "ev2 drifts across session timezones")
  }
}
