package graft.operators

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec

/** Property tests for the round-10 consumed-plan operators: random inputs
  * drive the REAL Spark plans (not unit-level Scala), sampled with fixed
  * seeds for reproducibility — the PropertiesSpec pattern applied to
  * merge semantics and range routing.
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

  private implicit class PairMap(rows: Array[(String, Long, Long)]) {
    def toMap2: Map[String, (Long, Long)] =
      rows.map(t => t._1 -> ((t._2, t._3))).toMap
  }
}
