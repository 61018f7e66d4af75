package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** One fixture per ts encoding the driver has ever shipped; all three must
  * normalize to byte-identical (ts, ts_ns). A fourth encoding should be
  * added here the day it appears.
  */
class EventEncodingSpec extends SparkSpec {

  // two instants a second apart, exact at micros precision — plus one whose
  // epoch-NANOS value (us·1000 = ...001000, divisible by 8 but not 256) is
  // NOT representable as a double: doubles at ~1.7e18 magnitude space 256 ns
  // apart, so a double-division nanos→micros path truncates this value 1 µs
  // low. Catches any regression from exact `DIV` back to `Column./`.
  private val micros = Seq(1700000000000000L, 1700000001500000L, 1700000000000001L)

  private def writeFixture(encode: org.apache.spark.sql.Column): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-enc").toString + "/events.parquet"
    micros.zipWithIndex.toDF("us", "event_id")
      .select(col("event_id").cast("long"), encode.as("ts"), lit("click").as("event_type"))
      .coalesce(1)
      .write.parquet(dir)
    dir.stripSuffix("/events.parquet")
  }

  private def normalized(dir: String): Set[(Long, Long, Long)] =
    TestData.events(spark, dir)
      .select(col("event_id"), unix_micros(col("ts")), col("ts_ns"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private val expected: Set[(Long, Long, Long)] =
    micros.zipWithIndex.map { case (us, i) => (i.toLong, us, us * 1000L) }.toSet

  test("nanos-long encoding normalizes to (ts micros, ts_ns)") {
    val dir = writeFixture((col("us") * 1000L).cast(LongType))
    val ds = TestData.events(spark, dir)
    assert(ds.schema("ts").dataType == TimestampType)
    assert(ds.schema("ts_ns").dataType == LongType)
    assert(normalized(dir) == expected)
  }

  test("TIMESTAMP (UTC-adjusted micros) encoding normalizes identically") {
    val dir = writeFixture(timestamp_micros(col("us")))
    assert(TestData.events(spark, dir).schema("ts").dataType == TimestampType)
    assert(normalized(dir) == expected)
  }

  test("TIMESTAMP_NTZ (unadjusted micros — current driver encoding) normalizes identically") {
    val dir = writeFixture(timestamp_micros(col("us")).cast(TimestampNTZType))
    // precondition: the fixture really round-trips as NTZ
    assert(spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType == TimestampNTZType)
    assert(TestData.events(spark, dir).schema("ts").dataType == TimestampType)
    assert(normalized(dir) == expected)
  }

  test("an unhandled ts type fails loudly, naming the fix location") {
    val dir = writeFixture(col("us").cast("string"))
    val e = intercept[IllegalArgumentException](TestData.events(spark, dir))
    assert(e.getMessage.contains("EventEncoding"))
  }

  test("tsMillis agrees across encodings") {
    import spark.implicits._
    val df = micros.toDF("us")
    val viaLong = df.select(EventEncoding.tsMillis(LongType, col("us") * 1000L)).as[Long].collect()
    val viaTs = df.select(EventEncoding.tsMillis(TimestampType, timestamp_micros(col("us"))))
      .as[Long].collect()
    val viaNtz = df.select(EventEncoding.tsMillis(TimestampNTZType,
      timestamp_micros(col("us")).cast(TimestampNTZType))).as[Long].collect()
    assert(viaLong.toSeq == micros.map(_ / 1000L))
    assert(viaTs.toSeq == viaLong.toSeq)
    assert(viaNtz.toSeq == viaLong.toSeq)
  }
}
