package graft

import graft.cdc.Changefeed
import org.apache.spark.sql.functions._

/** HLC wire-format parse cases mirrored from the reference's own table
  * (`internal/util/hlc/hlc_test.go:146` `TestParse`): the same strings
  * must produce the same accept/reject decisions and components —
  * except that a reject here is a NULL struct (DLQ route), never a
  * feed-wide error.
  */
class HlcParseSpec extends SparkSpec {
  import spark.implicits._

  private val cases: Seq[(String, Option[(Long, Int)])] = Seq(
    ("", None),
    (".", None),
    ("1233", None),
    (".1233", None),
    ("123.123", None), // logical part: 10 digits or all-zero only
    ("0.0000000000", Some((0L, 0))),
    ("1586019746136571000.0000000000", Some((1586019746136571000L, 0))),
    ("1586019746136571000.0000000001", Some((1586019746136571000L, 1))),
    ("9223372036854775807.2147483647", Some((Long.MaxValue, Int.MaxValue))),
    // beyond the reference table: overflow guards must reject, not wrap
    ("9223372036854775808.0000000000", None), // nanos > Long.MaxValue
    ("123.2147483648", None)) // logical > Int.MaxValue

  test("parseHlc matches the reference hlc.Parse decision table") {
    val df = cases.map(_._1).toDF("s")
      .withColumn("hlc", Changefeed.parseHlc("s"))
    val got = df.select(col("s"), col("hlc.nanos"), col("hlc.logical"))
      .collect().map { r =>
        r.getString(0) -> (if (r.isNullAt(1)) None
          else Some((r.getLong(1), r.getInt(2))))
      }.toMap
    cases.foreach { case (s, want) =>
      assert(got(s) == want, s"case '$s'")
    }
  }
}
