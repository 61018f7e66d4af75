package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests for the consumed-plan operators (rounds 10-11): random
  * inputs drive the REAL Spark plans (not unit-level Scala), sampled with
  * fixed seeds for reproducibility — the PropertiesSpec pattern applied
  * to merge semantics, range routing, the physical range write, zone
  * pruning, and minimal-level anonymization.
  */
class ConsumedPlanPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  test("mergeUpsert: serial version-order replay equivalence under random write logs") {
    // random unique orderkeys randomize writer (parity), tombstones (%7),
    // and version order; random custkeys randomize conflict structure
    val gen = Gen.listOfN(80, Gen.chooseNum(1L, 100000L)).map(_.distinct)
    for (seed <- 1L to 3L) {
      val orderkeys = sample(gen, seed)
      val customer = (1L to 15L).map(k => (k, k.toDouble))
        .toDF("c_custkey", "c_acctbal")
      val writes = orderkeys.map(v => (v, (v * 31 % 20) + 1, (v % 500).toDouble))
      val orders = writes.toDF("o_orderkey", "o_custkey", "o_totalprice")

      // serial replay in version (= orderkey) order, plain Scala
      var state = (1L to 15L).map(k => k -> Option(k * 100)).toMap
      writes.sortBy(_._1).foreach { case (v, key, price) =>
        if (v % 7 == 0) state += key -> None
        else state += key -> Some(math.floor(price * 100).toLong)
      }
      val merged = Scd.mergeUpsert(customer, orders)
        .select("key", "final_state", "final_cents")
        .as[(Long, String, Option[Long])].collect()
      assert(merged.map(_._1).toSet == state.keySet, s"seed $seed: key coverage")
      merged.foreach { case (k, st, cents) =>
        val expected = state(k)
        if (st == "deleted") assert(expected.isEmpty, s"seed $seed key $k: not deleted serially")
        else assert(cents == expected, s"seed $seed key $k: $st $cents vs serial $expected")
      }
    }
  }

  test("rangeBalancedShards: routing is a partition of the rows for arbitrary price shapes") {
    // mixtures of uniforms, duplicates, and heavy spikes
    val gen = Gen.listOfN(200, Gen.frequency(
      6 -> Gen.chooseNum(1.0, 5000.0),
      3 -> Gen.oneOf(42.0, 99.99, 1234.56), // heavy repeated values
      1 -> Gen.chooseNum(0.01, 1.0)))
    for (seed <- 1L to 3L) {
      val prices = sample(gen, seed)
      val li = prices.toDF("l_extendedprice")
      val rows = Planning.rangeBalancedShards(li, buckets = 5).collect()
      // every row routed exactly once, every shard matching its histogram depth
      assert(rows.map(_.getLong(3)).sum == prices.length.toLong, s"seed $seed: row coverage")
      rows.foreach(r => assert(r.getBoolean(5),
        s"seed $seed: assigned must equal histogram depth: $r"))
      // buckets tile the cent domain in order without overlap
      val sorted = rows.sortBy(_.getLong(0))
      assert(sorted.forall(r => r.getLong(1) <= r.getLong(2)), s"seed $seed: lo <= hi")
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(2) < b.getLong(1),
          s"seed $seed: bucket ranges overlap")
        case _ => ()
      }
    }
  }

  test("executeJoinOrder: result totals are order-invariant for random join graphs") {
    val gen = Gen.listOfN(60, Gen.zip(
      Gen.chooseNum(1L, 40L), Gen.chooseNum(1.0, 100.0)))
    for (seed <- 1L to 2L) {
      val lines = sample(gen, seed)
      val customer = (1L to 10L).toDF("c_custkey")
      val orders = (1L to 40L).map(o => (o, (o % 10) + 1))
        .toDF("o_orderkey", "o_custkey")
      val lineitem = lines.toDF("l_orderkey", "l_extendedprice")
      val rows = Planning.executeJoinOrder(customer, orders, lineitem)
        .select("order_rank", "n_rows", "total_cents")
        .as[(String, Long, Long)].collect().toMap2
      assert(rows.keySet == Set("best", "worst"), s"seed $seed")
      assert(rows("best") == rows("worst"),
        s"seed $seed: executed orders must agree on results")
    }
  }

  test("rangePartitionedWrite: the disk round trip preserves the partition " +
      "property for arbitrary price shapes") {
    val gen = Gen.listOfN(150, Gen.frequency(
      6 -> Gen.chooseNum(1.0, 5000.0),
      3 -> Gen.oneOf(42.0, 99.99, 1234.56),
      1 -> Gen.chooseNum(0.01, 1.0)))
    for (seed <- 1L to 2L) {
      val out = java.nio.file.Files.createTempDirectory(s"graft-rpw-prop$seed")
      try {
        val prices = sample(gen, seed)
        val rows = Planning.rangePartitionedWrite(
          prices.toDF("l_extendedprice"), out.toString, buckets = 5).collect()
        assert(rows.map(_.getAs[Long]("rows_on_disk")).sum == prices.length.toLong,
          s"seed $seed: every row must survive the disk round trip")
        rows.foreach { r =>
          assert(r.getAs[Boolean]("depth_match"), s"seed $seed: $r")
          assert(r.getAs[Boolean]("bounds_match"), s"seed $seed: $r")
        }
      } finally graft.Scratch.rmTree(out.toFile)
    }
  }

  test("zonePrunedScan: pruned totals equal the direct filter for random " +
      "date spreads") {
    // dates across 1995-2002 so predicates hit, straddle, and miss zones
    val gen = Gen.listOfN(120, Gen.zip(
      Gen.chooseNum(1995, 2002), Gen.chooseNum(1, 12), Gen.chooseNum(1, 28),
      Gen.chooseNum(1.0, 500.0)))
    for (seed <- 1L to 2L) {
      val out = java.nio.file.Files.createTempDirectory(s"graft-zps-prop$seed")
      try {
        val rows = sample(gen, seed).map { case (y, m, d, p) =>
          (f"$y-$m%02d-$d%02d 00:00:00", p)
        }
        val df = rows.toDF("ship_s", "l_extendedprice")
          .select(col("ship_s").cast("timestamp_ntz").as("l_shipdate"),
            col("l_extendedprice"))
        val audit = Planning.zonePrunedScan(df, s"$out/fact").collect()
        val preds = Seq(
          ("p1996", "1996-01-01", "1997-01-01"),
          ("p1998h1", "1998-01-01", "1998-07-01"),
          ("p2001h2", "2001-06-01", "2002-01-01"))
        for ((id, lo, hi) <- preds) {
          val a = audit.find(_.getAs[String]("pred_id") == id).get
          val direct = df.filter(
              col("l_shipdate") >= lit(lo).cast("timestamp_ntz") &&
              col("l_shipdate") < lit(hi).cast("timestamp_ntz"))
            .agg(count(lit(1)),
              sum(graft.functions.OracleSafe.quant(col("l_extendedprice"), 100)))
            .head()
          assert(a.getAs[Long]("n_rows") == direct.getLong(0),
            s"seed $seed $id: pruned count must equal the direct filter")
          val cents = if (direct.isNullAt(1)) null else direct.getLong(1)
          assert(a.getAs[Any]("total_cents") == cents, s"seed $seed $id: totals")
          assert(a.getAs[Long]("rows_read") >= a.getAs[Long]("n_rows"),
            s"seed $seed $id: a scan reads at least what it returns")
        }
      } finally graft.Scratch.rmTree(out.toFile)
    }
  }

  test("anonymizeToK: any release partitions the population, clears k in " +
      "every group, and sits at the minimal level") {
    val gen = Gen.listOfN(40, Gen.zip(
      Gen.chooseNum(1L, 4L), Gen.oneOf("AUTO", "HOME"),
      Gen.chooseNum(-500.0, 2500.0)))
    for (seed <- 1L to 3L; k <- Seq(2, 5, 50)) {
      val rows = sample(gen, seed)
      val df = rows.toDF("c_nationkey", "c_mktsegment", "c_acctbal")
      val rel = Privacy.anonymizeToK(df, k).collect()
      if (rel.isEmpty) {
        // nothing released only when even full merging cannot reach k
        assert(rows.length < k, s"seed $seed k=$k: empty release only below k rows")
      } else {
        assert(rel.map(_.getAs[Long]("n")).sum == rows.length.toLong,
          s"seed $seed k=$k: the release must partition all rows")
        assert(rel.forall(_.getAs[Long]("n") >= k),
          s"seed $seed k=$k: every group clears k")
        val lv = rel.head.getAs[Int]("level")
        if (lv > 0) {
          // the level below the chosen one must NOT satisfy k
          val below = Privacy.kAnonymityAudit(df, k)
            .filter(col("level") === lv - 1).head()
          assert(!below.getAs[Boolean]("satisfies_k"),
            s"seed $seed k=$k: level ${lv - 1} satisfying would make $lv non-minimal")
        }
      }
    }
  }

  private implicit class PairMap(rows: Array[(String, Long, Long)]) {
    def toMap2: Map[String, (Long, Long)] =
      rows.map(t => t._1 -> ((t._2, t._3))).toMap
  }
}
