package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Morton key correctness against a bit-by-bit reference, plus the actual
  * POINT of z-ordering: per-file min/max stay narrow on BOTH dimensions,
  * where a single-column sort leaves the second dimension spanning the
  * full domain (so parquet stats can't skip anything for filters on it).
  */
class ZOrderSpec extends SparkSpec {

  /** Bit-by-bit reference interleave over the low 16 bits. */
  private def ref(a: Long, b: Long): Long =
    (0 until 16).foldLeft(0L) { (z, i) =>
      z | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }

  test("morton matches the bit-by-bit reference (wide inputs masked)") {
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L),
      (12345L, 54321L), (70000L, 3L), (3L, 1048576L))
    val got = rows.toDF("a", "b")
      .select(col("a"), col("b"), ZOrder.morton(col("a"), col("b")))
      .collect()
    got.foreach { r =>
      assert(r.getLong(2) == ref(r.getLong(0) & 0xFFFF, r.getLong(1) & 0xFFFF),
        s"(${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("morton key is a bijection on the 16x16-bit grid (sample)") {
    import spark.implicits._
    val pts = for (a <- 0 until 64; b <- 0 until 64) yield (a.toLong, b.toLong)
    val keys = pts.toDF("a", "b").select(ZOrder.morton(col("a"), col("b")))
      .collect().map(_.getLong(0))
    assert(keys.distinct.length == pts.length)
  }

  test("z-ordered files are narrow on BOTH dims; single-sort leaves dim b wide") {
    // decorrelated pseudo-uniform 12-bit dims from murmur3 of the row id
    val domain = 4096.0
    val df = spark.range(1 << 14).select(
      pmod(hash(col("id")), lit(4096)).cast("long").as("a"),
      pmod(hash(col("id") * 7 + 1), lit(4096)).cast("long").as("b"))
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    ZOrder.writeZOrdered(df, s"$dir/z", col("a"), col("b"), numFiles = 16)
    df.repartitionByRange(16, col("a")).sortWithinPartitions("a")
      .write.parquet(s"$dir/lin")

    def meanSpan(path: String, c: String): Double =
      spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max(col(c)) - min(col(c))).as("w"))
        .agg(avg("w")).head().getDouble(0)

    // 16 z-ranges over a 4096^2 grid ≈ 4x4 quadrants: each file covers
    // ~1/4 of each axis (plus boundary straddle). The single-column sort
    // is even narrower on `a` but cannot bound `b` at all.
    assert(meanSpan(s"$dir/z", "a") < domain * 0.55)
    assert(meanSpan(s"$dir/z", "b") < domain * 0.55)
    assert(meanSpan(s"$dir/lin", "b") > domain * 0.8)
    // content invariance: the layout rewrite must not change the data
    assert(spark.read.parquet(s"$dir/z").count() == (1 << 14))
  }

  test("hilbert: bijection AND unit-step continuity on the full 5-bit grid") {
    // every (x, y) on a 32x32 grid: the d-index must be a permutation of
    // 0..1023, and consecutive d values must sit at Manhattan distance
    // EXACTLY 1 — the continuity property that distinguishes the Hilbert
    // curve from Morton (whose quadrant seams jump diagonally)
    val n = 32
    val grid = spark.range(n.toLong * n).select(
      (col("id") % n).as("x"), (col("id") / n).cast("long").as("y"))
    val keyed = ZOrder.withHilbert(grid, col("x"), col("y"), "d", bits = 5)
      .select("d", "x", "y").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(keyed.map(_._1).toSeq == (0L until n.toLong * n).toSeq, "bijection")
    val steps = keyed.sliding(2).map { case Array((_, x1, y1), (_, x2, y2)) =>
      math.abs(x2 - x1) + math.abs(y2 - y1)
    }.toSeq
    assert(steps.forall(_ == 1L), s"non-unit steps: ${steps.filter(_ != 1L).size}")
    // Morton on the same grid CANNOT be continuous — the discriminator
    val mort = grid.select(ZOrder.morton(col("x"), col("y")), col("x"), col("y"))
      .collect().map(r => (r.getLong(0).toLong, r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val mSteps = mort.sliding(2).map { case Array((_, x1, y1), (_, x2, y2)) =>
      math.abs(x2 - x1) + math.abs(y2 - y1)
    }.toSeq
    assert(mSteps.exists(_ > 1L), "morton must jump at quadrant seams")
  }

  test("hilbert-clustered files are narrow on BOTH dims") {
    val domain = 4096.0
    val df = spark.range(1 << 14).select(
      pmod(hash(col("id")), lit(4096)).cast("long").as("a"),
      pmod(hash(col("id") * 7 + 1), lit(4096)).cast("long").as("b"))
    val dir = java.nio.file.Files.createTempDirectory("graft-hilbert").toString
    try {
      ZOrder.writeHilbertOrdered(df, s"$dir/h", col("a"), col("b"), numFiles = 16)
      def meanSpan(path: String, c: String): Double =
        spark.read.parquet(path)
          .groupBy(input_file_name())
          .agg((max(col(c)) - min(col(c))).as("w"))
          .agg(avg("w")).head().getDouble(0)
      assert(meanSpan(s"$dir/h", "a") < domain * 0.55)
      assert(meanSpan(s"$dir/h", "b") < domain * 0.55)
      assert(spark.read.parquet(s"$dir/h").count() == (1 << 14))
    } finally graft.Scratch.rmTree(new java.io.File(dir))
  }
}
