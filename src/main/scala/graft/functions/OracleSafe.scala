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

  /** Money LEAVING the engine: cast the exact decimal to DOUBLE in the final
    * projection (and the oracle SQL twin does the same). Values sit on an
    * exact 0.01 grid, so every engine rounds to the identical float64 and
    * renders the identical shortest representation — whereas a DECIMAL
    * output renders scale-preserving on one engine ("123.40") and
    * float-style on another ("123.4"), defeating a textual hasher even when
    * values are exact. Arithmetic stays decimal; ONLY the boundary changes.
    */
  def moneyOut(c: Column): Column = c.cast("double")

  def moneyOutSql(expr: String): String = s"CAST(($expr) AS DOUBLE)"

  /** Quantize an embedding float to an integer grid: exact BIGINT arithmetic
    * downstream (dot products, norms) is then engine- and order-independent.
    */
  def quant(c: Column, scale: Int = 10000): Column =
    floor(c.cast("double") * lit(scale)).cast("long")

  def quantSql(expr: String, scale: Int = 10000): String =
    s"CAST(FLOOR(CAST(($expr) AS DOUBLE)*$scale) AS BIGINT)"

  /** Exact integer FLOOR division (b > 0), identical on both engines for
    * ANY sign of `a` over the FULL BIGINT range: both Spark's integral
    * `div` and DuckDB's `//` truncate toward zero, and truncation equals
    * floor except when the remainder is negative — correct that case by
    * subtracting 1. All-integral arithmetic (a double `/` would lose ulps
    * above 2^53), and — unlike the subtract-positive-mod formulation —
    * nothing here can overflow: `a - pmod(a,b)` underflows BIGINT for `a`
    * within `b` of Long.MinValue, while `div` and the `-1` correction are
    * total for b > 0. SQL twin: [[intDivSql]].
    */
  def intDiv(a: Column, b: Column): Column = {
    val (al, bl) = (a.cast("long"), b.cast("long"))
    val q = call_function("div", al, bl)
    when(al % bl < 0, q - lit(1L)).otherwise(q)
  }

  /** DuckDB twin of [[intDiv]]: truncating `//` with the same
    * negative-remainder floor correction (DuckDB's `%` follows the
    * dividend's sign, exactly like Spark's).
    */
  def intDivSql(a: String, b: String): String =
    s"((($a) // ($b)) - CASE WHEN (($a) % ($b)) < 0 THEN 1 ELSE 0 END)"
}
