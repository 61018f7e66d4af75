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

  /** q261 — HILBERT clustering key, the locality upgrade over [[morton]]:
    * consecutive Hilbert indices are always Manhattan-distance 1 apart
    * (the curve is continuous), whereas the Morton curve takes long
    * diagonal jumps at quadrant seams — so an equal-size key range maps
    * to a tighter (a, b) bounding box and file-level min/max stats prune
    * harder for the same sort (the reason Hilbert is the default
    * clustering curve in several lakehouse engines' OPTIMIZE).
    *
    * The d-index is the classic quadrant-rotation walk (the public
    * Wikipedia/Warren formulation): per bit plane from high to low,
    * d += s²·((3·rx) xor ry), then reflect/swap the frame. Branch-free
    * enough for codegen — each plane is one projection step whose
    * expressions reference the previous step's columns as attributes, so
    * the expression TREE stays linear in `bits` (inlining the steps would
    * double the tree per plane; Catalyst's collapse rule keeps non-cheap
    * multi-referenced steps materialized). All arithmetic is BIGINT-exact
    * shift/mask/xor — no floats anywhere, and the DuckDB twin
    * ([[hilbertSql]]) is generated from the same plane loop so the
    * engines cannot drift.
    */
  def withHilbert(df: DataFrame, a: Column, b: Column, out: String,
      bits: Int = 16): DataFrame = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    val nm1 = (1L << bits) - 1
    var cur = df.withColumns(Map(
      "__hx" -> a.cast("long").bitwiseAND(lit(nm1)),
      "__hy" -> b.cast("long").bitwiseAND(lit(nm1)),
      "__hd" -> lit(0L)))
    for (k <- bits - 1 to 0 by -1) {
      val s2 = 1L << (2 * k)
      val x = col("__hx"); val y = col("__hy")
      val rx = shiftright(x, k).bitwiseAND(lit(1L))
      val ry = shiftright(y, k).bitwiseAND(lit(1L))
      cur = cur.withColumns(Map(
        "__hd" -> (col("__hd") + lit(s2) * (lit(3L) * rx).bitwiseXOR(ry)),
        "__hx" -> when(ry === 1, x)
          .otherwise(when(rx === 1, lit(nm1) - y).otherwise(y)),
        "__hy" -> when(ry === 1, y)
          .otherwise(when(rx === 1, lit(nm1) - x).otherwise(x))))
    }
    cur.withColumn(out, col("__hd")).drop("__hx", "__hy", "__hd")
  }

  /** DuckDB twin of [[withHilbert]] as a step-per-CTE chain generated
    * from the same plane loop. `from` must expose `aExpr`/`bExpr`
    * (BIGINT) and `carryCols`; select `hkey` from `hfinal`.
    */
  def hilbertSql(from: String, aExpr: String, bExpr: String,
      carryCols: Seq[String], bits: Int = 16): String = {
    val nm1 = (1L << bits) - 1
    val carry = carryCols.mkString(", ")
    val steps = (bits - 1 to 0 by -1).zipWithIndex.map { case (k, i) =>
      val s2 = 1L << (2 * k)
      val rx = s"((x >> $k) & 1)"
      val ry = s"((y >> $k) & 1)"
      s"""h${i + 1} AS (
         |  SELECT $carry,
         |         CASE WHEN $ry = 1 THEN x
         |              WHEN $rx = 1 THEN $nm1 - y ELSE y END AS x,
         |         CASE WHEN $ry = 1 THEN y
         |              WHEN $rx = 1 THEN $nm1 - x ELSE x END AS y,
         |         d + $s2 * xor(3 * $rx, $ry) AS d
         |  FROM h$i)""".stripMargin
    }
    s"""h0 AS (
       |  SELECT $carry, (($aExpr) & $nm1) AS x, (($bExpr) & $nm1) AS y,
       |         CAST(0 AS BIGINT) AS d
       |  FROM $from),
       |${steps.mkString(",\n")},
       |hfinal AS (SELECT $carry, d AS hkey FROM h$bits)""".stripMargin
  }

  /** Write `df` Hilbert-clustered on (`a`, `b`) — same sorted-write shape
    * as [[writeZOrdered]] with the continuous curve as the key.
    */
  def writeHilbertOrdered(df: DataFrame, path: String, a: Column, b: Column,
      numFiles: Int): Unit =
    withHilbert(df, a, b, "__h")
      .repartitionByRange(numFiles, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write.mode("overwrite").parquet(path)
}
