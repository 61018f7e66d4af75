package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** The one place that knows how the driver encodes `events.ts` on disk.
  *
  * The testdata generator has shipped three encodings of the same instant
  * column across rounds:
  *
  *   1. parquet TIMESTAMP(NANOS)  → LongType epoch-nanos under
  *      `spark.sql.legacy.parquet.nanosAsLong=true`;
  *   2. parquet TIMESTAMP(MICROS, adjustedToUTC=true) → TimestampType;
  *   3. parquet TIMESTAMP(MICROS, adjustedToUTC=false) → TimestampNTZType
  *      (the current encoding — `timestamp[us]` written without a zone).
  *
  * Every consumer (batch [[TestData.events]] and the five streaming readers
  * in [[graft.streaming.EventStream]]) derives its time columns through
  * these schema-driven expressions, so a fourth encoding is a one-branch
  * addition HERE rather than a per-call-site hunt. All expressions are
  * plain Catalyst columns — they ride inside whole-stage codegen and work
  * identically under `readStream` (where only the schema, never the data,
  * is available at plan time).
  *
  * NTZ note: the session time zone is pinned UTC (`GraftSession`), so
  * `TIMESTAMP_NTZ → TIMESTAMP` is instant-preserving — the wall-clock
  * field values ARE the UTC instant, matching how the DuckDB oracle reads
  * the same file natively as `timestamp[us]`.
  */
object EventEncoding {

  private def unsupported(dt: DataType): Nothing =
    throw new IllegalArgumentException(
      s"events.ts has unhandled type $dt — add a branch in EventEncoding " +
        "(known: LongType epoch-nanos, TIMESTAMP, TIMESTAMP_NTZ)")

  /** Exact integer division (Catalyst `IntegralDivide`, SQL `DIV`).
    * Spark's `Column./` is DOUBLE division; at epoch-nano magnitude
    * (~1.7e18) doubles space 256 ns apart, so `(c / 1000L).cast("long")`
    * silently truncates ~half of whole-microsecond values 1 µs low. The
    * long branches below must stay on integer arithmetic.
    */
  private def intDiv(c: Column, d: Long): Column =
    call_function("div", c, lit(d))

  /** `ts` as TimestampType (Spark's native micros precision). */
  def tsMicros(dt: DataType, c: Column = col("ts")): Column = dt match {
    case LongType          => timestamp_micros(intDiv(c, 1000L))
    case TimestampType     => c
    case TimestampNTZType  => c.cast(TimestampType)
    case other             => unsupported(other)
  }

  /** `ts` as LongType epoch-nanos — exact integer time arithmetic for
    * oracles that read full nanos (lossless for encodings 2 and 3, whose
    * files never carried sub-micro digits).
    */
  def tsNanos(dt: DataType, c: Column = col("ts")): Column = dt match {
    case LongType          => c
    case TimestampType     => unix_micros(c) * 1000L
    case TimestampNTZType  => unix_micros(c.cast(TimestampType)) * 1000L
    case other             => unsupported(other)
  }

  /** `ts` as LongType epoch-millis (sessionization state machines). */
  def tsMillis(dt: DataType, c: Column = col("ts")): Column = dt match {
    case LongType          => intDiv(c, 1000000L)
    case TimestampType     => unix_millis(c)
    case TimestampNTZType  => unix_millis(c.cast(TimestampType))
    case other             => unsupported(other)
  }

  /** Normalize a raw events frame to the engine's logical schema: `ts` as
    * TimestampType plus exact `ts_ns` epoch-nanos, whatever the disk
    * encoding.
    */
  def normalize(raw: DataFrame): DataFrame = raw.schema("ts").dataType match {
    case LongType =>
      raw.withColumnRenamed("ts", "ts_ns")
        .withColumn("ts", tsMicros(LongType, col("ts_ns")))
    case dt =>
      raw.withColumn("ts_ns", tsNanos(dt))
        .withColumn("ts", tsMicros(dt))
  }
}
