package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.TestData

/** q237: the persisted per-zone Bloom index — no false negatives, exact
  * totals from the pruned scan, physical partition pruning on the layout,
  * and bounded false-positive fan-out for absent keys.
  */
class BloomIndexSpec extends SparkSpec {

  private def run(out: java.nio.file.Path) =
    Planning.bloomIndexedLookup(TestData.lineitem(spark, sf),
      s"$out/bloom_index").collect()
      .map(r => r.getAs[Long]("probe_key") -> r).toMap

  test("no false negatives: every present key's rows and cents survive the pruned scan") {
    val out = java.nio.file.Files.createTempDirectory("graft-bidx-spec")
    try {
      val got = run(out)
      val expect = TestData.lineitem(spark, sf)
        .filter(col("l_orderkey") % 997 === 0)
        .groupBy(col("l_orderkey").as("probe_key"))
        .agg(count(lit(1)).as("n_rows"),
          sum(graft.functions.OracleSafe.quant(col("l_extendedprice"), 100))
            .as("total_cents"))
        .collect()
        .map(r => r.getAs[Long]("probe_key") ->
          (r.getAs[Long]("n_rows"), r.getAs[Long]("total_cents"))).toMap
      assert(expect.nonEmpty, "probe set must not be empty at this sf")
      for ((k, (n, cents)) <- expect) {
        val r = got(k)
        assert(r.getAs[Long]("n_rows") == n, s"key $k row count")
        assert(r.getAs[Long]("total_cents") == cents, s"key $k total")
        assert(r.getAs[Long]("zones_candidate") >= r.getAs[Long]("zones_matching"),
          s"key $k: candidates must cover every matching zone")
        assert(r.getAs[Long]("zones_matching") >= 1L)
      }
    } finally graft.Scratch.rmTree(out.toFile)
  }

  test("absent keys: zero rows, NULL total, and bounded false-positive fan-out") {
    val out = java.nio.file.Files.createTempDirectory("graft-bidx-spec")
    try {
      val got = run(out)
      val misses = got.filter(_._1 >= 1000000000L).values.toSeq
      assert(misses.nonEmpty)
      for (r <- misses) {
        assert(r.getAs[Long]("n_rows") == 0L && r.getAs[Long]("zones_matching") == 0L)
        assert(r.isNullAt(r.fieldIndex("total_cents")),
          "a lookup that matches nothing sums to NULL")
      }
      // the index's point: an absent key fans out to a HANDFUL of
      // false-positive zones, not the whole calendar (expected ~3.1%
      // of zones at 8 bits / 3 hashes; deterministic md5 arithmetic)
      val total = misses.head.getAs[Long]("zones_total").toDouble
      val avgCand = misses.map(_.getAs[Long]("zones_candidate")).sum.toDouble / misses.size
      assert(avgCand <= 0.15 * total,
        s"avg false-positive fan-out $avgCand must stay well under $total zones")
    } finally graft.Scratch.rmTree(out.toFile)
  }

  test("the layout prunes physically: a one-zone filter opens one partition dir") {
    val out = java.nio.file.Files.createTempDirectory("graft-bidx-spec")
    try {
      run(out)
      val fact = s"$out/bloom_index/fact"
      val nZones = new java.io.File(fact).listFiles()
        .count(f => f.isDirectory && f.getName.startsWith("zone="))
      assert(nZones > 1)
      val someZone = new java.io.File(fact).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("zone="))
        .map(_.getName.stripPrefix("zone=").toLong).min
      val probe = spark.read.parquet(fact).filter(col("zone") === someZone)
      probe.collect()
      val selected = probe.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }.sum
      assert(selected == 1, s"one-zone lookup must open 1 of $nZones dirs, opened $selected")
    } finally graft.Scratch.rmTree(out.toFile)
  }

  test("q245 maintenance: delta appends touch only its zones, sizes stay frozen, no false negatives") {
    val out = java.nio.file.Files.createTempDirectory("graft-bidx-spec")
    try {
      val idx = s"$out/bloom_index"
      val li = TestData.lineitem(spark, sf)
      val base = li.filter(col("l_orderkey") % 7 =!= 1L)
      val delta = li.filter(col("l_orderkey") % 7 === 1L)
      Planning.buildBloomIndex(base, idx)

      def bloomFiles(): Map[String, Set[String]] =
        new java.io.File(s"$idx/bloom").listFiles()
          .filter(f => f.isDirectory && f.getName.startsWith("zone="))
          .map(d => d.getName ->
            d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet)
          .toMap
      val before = bloomFiles()
      val metaBefore = spark.read.parquet(s"$idx/meta")
        .collect().map(r => r.getAs[Long]("zone") -> r.getAs[Long]("m")).toMap

      Planning.appendBloomIndexDelta(delta, idx)

      // (a) untouched zones' bloom file sets are byte-identical
      val touched = delta
        .select(((year(col("l_shipdate")) * 12 + month(col("l_shipdate")))
          .cast("long")).as("zone"))
        .distinct().collect().map(r => s"zone=${r.getLong(0)}").toSet
      val after = bloomFiles()
      for ((dir, files) <- before if !touched(dir))
        assert(after(dir) == files, s"$dir gained files without a delta row")
      // (b) frozen sizes: every base zone's m is unchanged after the append
      val metaAfter = spark.read.parquet(s"$idx/meta")
        .collect().map(r => r.getAs[Long]("zone") -> r.getAs[Long]("m")).toMap
      for ((z, m) <- metaBefore)
        assert(metaAfter(z) == m, s"zone $z's bit size must stay frozen")
      // (c) the loaded bloom stays duplicate-free (the OR-in contract)
      val bloom = spark.read.parquet(s"$idx/bloom")
      assert(bloom.count() == bloom.distinct().count(),
        "maintenance must never write an already-set bit")
      // (d) no false negatives across maintenance: every probe key drawn
      // from the delta finds all its rows through the maintained index
      val served = Planning.serveBloomIndex(li, idx).collect()
        .map(r => r.getAs[Long]("probe_key") -> r).toMap
      val expect = li.filter(col("l_orderkey") % 997 === 0)
        .groupBy(col("l_orderkey").as("probe_key"))
        .agg(count(lit(1)).as("n_rows"))
        .collect().map(r => r.getAs[Long]("probe_key") -> r.getAs[Long]("n_rows")).toMap
      assert(expect.nonEmpty)
      for ((k, n) <- expect)
        assert(served(k).getAs[Long]("n_rows") == n,
          s"key $k must keep all $n rows through the maintained index")
    } finally graft.Scratch.rmTree(out.toFile)
  }

  test("q284: the intersection is tighter than either index and loses no rows") {
    val li = TestData.lineitem(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("graft-ixn-spec")
    try {
      val rows = Planning.indexIntersectionLookup(li, s"$out/ixn").collect()
      assert(rows.nonEmpty)
      val total = rows.head.getAs[Long]("zones_total")
      val range = rows.head.getAs[Long]("zones_range")
      assert(range > 0 && range < total,
        s"the window must survive a strict subset of zones: $range/$total")
      rows.foreach { r =>
        val (b, u) = (r.getAs[Long]("zones_bloom"), r.getAs[Long]("zones_used"))
        assert(u <= math.min(b, range), s"intersection not tighter: $r")
      }
      // the range side must actually cut some probe's bloom fan-out
      assert(rows.exists(r => r.getAs[Long]("zones_used")
        < r.getAs[Long]("zones_bloom")),
        "no probe was tightened by the range index — spec corpus too small?")
      // no false negatives: intersected totals equal the direct filter
      import org.apache.spark.sql.functions._
      val sdc = (year(col("l_shipdate")) * 10000
        + month(col("l_shipdate")) * 100 + dayofmonth(col("l_shipdate")))
        .cast("long")
      val mm = li.select(sdc.as("sd")).agg(min("sd"), max("sd")).head()
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val (wlo, whi) = (lo + (hi - lo) / 3, lo + 2 * ((hi - lo) / 3))
      val direct = li.filter(col("l_orderkey") % 997 === 0
          && sdc.between(wlo, whi))
        .groupBy(col("l_orderkey").as("probe_key"))
        .agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val got = rows.map(r => r.getAs[Long]("probe_key")
        -> r.getAs[Long]("n_rows")).toMap
      for ((k, n) <- direct)
        assert(got(k) == n, s"key $k: pruned scan lost rows (${got(k)} != $n)")
      // window derivation caveat: the zone map's span equals the raw span
      // because zones partition the table; the direct recompute above
      // re-derives the same [wlo, whi] the serve path got from the map
    } finally graft.Scratch.rmTree(out.toFile)
  }
}
