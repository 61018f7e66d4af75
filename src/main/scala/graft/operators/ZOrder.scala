package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping. A
  * layout sorted by one column prunes scans filtered on THAT column only;
  * interleaving the bits of two key columns gives a single sort key whose
  * contiguous ranges are small rectangles in (a, b) space — so parquet
  * per-row-group min/max stats stay narrow on BOTH columns and a reader
  * filtering on EITHER skips most files. This is the standard lakehouse
  * `OPTIMIZE ZORDER BY` layout, built here from pure column expressions.
  *
  * The interleave is the textbook magic-number bit spread (e.g. the
  * "Interleave bits by Binary Magic Numbers" construction from Sean
  * Anderson's public Bit Twiddling Hacks): 5 shift-or-mask steps spread a
  * 16-bit value over the even bits of a 32-bit word; the z-key is
  * spread(a) | spread(b) << 1. All BIGINT-exact, codegen'd, shuffle-free —
  * the only shuffle in a z-ordered WRITE is the range partition on the key,
  * which any sorted write needs anyway.
  */
object ZOrder {

  private val SpreadSteps: Seq[(Int, Long)] = Seq(
    8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)

  /** Spread the low 16 bits of `c` onto the even bit positions 0,2,…,30. */
  private def spread(c: Column): Column =
    SpreadSteps.foldLeft(c.bitwiseAND(lit(0xFFFFL))) { case (x, (s, m)) =>
      x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** 32-bit Morton key of two 16-bit dimensions (callers mask/bucket wider
    * domains down to 16 bits first — 65536 distinct cells per axis is far
    * finer than file-level min/max pruning can exploit anyway).
    */
  def morton(a: Column, b: Column): Column =
    spread(a).bitwiseOR(shiftleft(spread(b), 1)).as("zkey")

  /** DuckDB twin of [[morton]] as a CTE chain (step-per-CTE keeps the SQL
    * readable instead of exponentially duplicating the spread expression).
    * `from` must expose `aExpr`/`bExpr` (BIGINT) and `carryCols`.
    */
  def mortonSql(from: String, aExpr: String, bExpr: String,
      carryCols: Seq[String]): String = {
    val carry = carryCols.mkString(", ")
    val steps = SpreadSteps.zipWithIndex.map { case ((s, m), i) =>
      s"""z${i + 1} AS (
         |  SELECT $carry, ((xa | (xa << $s)) & $m) AS xa, ((xb | (xb << $s)) & $m) AS xb
         |  FROM z$i)""".stripMargin
    }
    s"""z0 AS (
       |  SELECT $carry, (($aExpr) & 65535) AS xa, (($bExpr) & 65535) AS xb
       |  FROM $from),
       |${steps.mkString(",\n")},
       |zfinal AS (SELECT $carry, (xa | (xb << 1)) AS zkey FROM z${SpreadSteps.size})""".stripMargin
  }

  /** Write `df` z-ordered on (`a`, `b`) — range-partition then sort by the
    * Morton key, so each output file owns a compact z-range (= a small
    * (a,b) rectangle, = narrow min/max on both columns). `numFiles` sizes
    * the layout; at scale derive it from bytes like
    * [[WarehouseSink.compact]] does.
    */
  def writeZOrdered(df: DataFrame, path: String, a: Column, b: Column,
      numFiles: Int): Unit =
    df.withColumn("__z", morton(a, b))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
}
