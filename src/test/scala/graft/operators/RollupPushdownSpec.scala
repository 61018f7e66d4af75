package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q255: the rollup + residual-scan pushdown — exactness against the
  * direct aggregate, and the residual scan physically opening only the
  * edge-block dirs.
  */
class RollupPushdownSpec extends SparkSpec {
  import spark.implicits._

  // one event per day for 90 days, value = day dollars: the derived
  // middle-half range is [22, 66] → block 0 edge, block 1 (days 30..59)
  // FULL, block 2 edge
  private def ev90 = (0L until 90L).map { d =>
    (d, 1L, "t", d * 86400000L, d.toDouble)
  }.toDF("event_id", "user_id", "event_type", "ms", "value")
    .selectExpr("event_id", "user_id", "event_type",
      "ms * 1000000 AS ts_ns", "value")

  test("rollup + residual equals the direct aggregate over the range") {
    val out = java.nio.file.Files.createTempDirectory("graft-rp-spec")
    try {
      val r = Planning.rollupPushdownAggregate(ev90, s"$out/tbl")
        .collect()
      assert(r.length == 1)
      val row = r.head
      // days 22..66 inclusive: 45 rows, cents = 100 * sum(22..66)
      assert(row.getAs[Long]("n") == 45L)
      assert(row.getAs[Long]("total_cents") == 100L * (22L to 66L).sum)
    } finally graft.Scratch.rmTree(out.toFile)
  }

  test("the residual scan opens only the two edge-block dirs") {
    val out = java.nio.file.Files.createTempDirectory("graft-rp-spec")
    try {
      Planning.rollupPushdownAggregate(ev90, s"$out/tbl")
      val nDirs = new java.io.File(s"$out/tbl/data").listFiles()
        .count(f => f.isDirectory && f.getName.startsWith("p="))
      assert(nDirs == 3, s"90 days at 30-day blocks = 3 dirs, found $nDirs")
      val residual = spark.read.parquet(s"$out/tbl/data")
        .filter(col("p").cast("long").isin(0L, 2L))
        .filter(col("day").between(22L, 66L))
      residual.collect()
      val opened = residual.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }.sum
      assert(opened == 2, s"residual must open 2 of 3 dirs, opened $opened")
      // and the rollup is lossless: its total equals the data's total
      val rolled = spark.read.parquet(s"$out/tbl/rollup")
        .agg(sum("n"), sum("cents")).head()
      assert(rolled.getLong(0) == 90L)
      assert(rolled.getLong(1) == 100L * (0L until 90L).sum)
    } finally graft.Scratch.rmTree(out.toFile)
  }

  test("q256: adjustments fold correctly and a fully-deleted group vanishes") {
    val out = java.nio.file.Files.createTempDirectory("graft-rp-spec")
    try {
      // block 0: 2 errors only (deleted → the whole group must vanish);
      // block 1: 1 purchase of 5.00 (updated → 10.00) + 1 view (carried);
      // block 2: 2 clicks of 1.00 (cloned → n 4, cents 400)
      val ev = Seq(
        (1L, "error", 0L, 1.0), (2L, "error", 5L, 2.0),
        (3L, "purchase", 31L, 5.0), (4L, "view", 32L, 3.0),
        (5L, "click", 61L, 1.0), (6L, "click", 62L, 1.0))
        .toDF("event_id", "event_type", "d", "value")
        .selectExpr("event_id", "1 AS user_id", "event_type",
          "d * 86400000 * 1000000 AS ts_ns", "value")
      val r = Planning.incrementalRollupMaintenance(ev, s"$out/tbl")
        .collect()
        .map(x => (x.getAs[Long]("p"), x.getAs[String]("event_type")) ->
          (x.getAs[Long]("n"), x.getAs[Long]("cents"))).toMap
      assert(r == Map(
        (1L, "purchase") -> ((1L, 1000L)),
        (1L, "view") -> ((1L, 300L)),
        (2L, "click") -> ((4L, 400L))),
        s"maintained rollup: $r")
    } finally graft.Scratch.rmTree(out.toFile)
  }
}
