package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Helpers that keep results bit-identical across engines (Spark vs the
  * DuckDB oracle) and across cluster re-runs.
  *
  * Floating-point SUM is order-dependent, and a distributed partial
  * aggregation will practically never add doubles in the same order as a
  * single-node engine. Money therefore lives in `DECIMAL(18,2)` (exact,
  * associative) from the moment it enters the pipeline — the same decision
  * the reference schema makes with its `DECIMAL(18,2)` Amount columns
  * (reference `data_source/schema.sql:44,126`).
  *
  * `quantize`: `floor(x*100)` of a double is an integer-valued double and is
  * identical on any IEEE-754 engine, so `floor(x*100)/100.0` recovers a value
  * strictly inside the half-ulp neighbourhood of a 2-decimal grid point;
  * casting that to DECIMAL(18,2) yields the same decimal under any rounding
  * mode. This makes double→decimal conversion engine-agnostic (a plain
  * `CAST(double AS DECIMAL)` is not: engines disagree on ties).
  */
object OracleSafe {
  /** Double column → exact DECIMAL(18,2), deterministically on any engine. */
  def money(c: Column): Column =
    (floor(c * lit(100)).cast("double") / lit(100.0)).cast(DecimalType(18, 2))

  /** SQL fragment with the same semantics, for DuckDB oracle strings. */
  def moneySql(expr: String): String =
    s"CAST(FLOOR(($expr)*100)/100.0 AS DECIMAL(18,2))"

  /** Quantize an embedding float to an integer grid: exact BIGINT arithmetic
    * downstream (dot products, norms) is then engine- and order-independent.
    */
  def quant(c: Column, scale: Int = 10000): Column =
    floor(c.cast("double") * lit(scale)).cast("long")

  def quantSql(expr: String, scale: Int = 10000): String =
    s"CAST(FLOOR(CAST(($expr) AS DOUBLE)*$scale) AS BIGINT)"
}
