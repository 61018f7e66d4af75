package graft.operators

import java.sql.Date

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ScdSpec extends SparkSpec {
  import spark.implicits._

  private val d0 = Date.valueOf("2026-01-01")
  private val d1 = Date.valueOf("2026-02-01")

  private val dim = Seq(
    (1L, "Hà Nội", d0, null.asInstanceOf[Date]),   // will change city
    (2L, "Cà Mau", d0, null.asInstanceOf[Date]),   // unchanged
    (3L, "Huế", d0, d0))                           // already closed history
    .toDF("CustomerID", "City", "effective_from", "effective_to")

  private val updates = Seq(
    (1L, "Hồ Chí Minh"), // change
    (2L, "Cà Mau"),      // no change
    (4L, "Đà Nẵng"))     // brand new
    .toDF("CustomerID", "City")

  test("type 2: closes changed, keeps unchanged, appends new, preserves history") {
    val out = Scd.type2(dim, updates, "CustomerID", Seq("City"), lit(d1))
      .orderBy("CustomerID", "effective_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        Option(r.getDate(2)).map(_.toString).orNull,
        Option(r.getDate(3)).map(_.toString).orNull))

    assert(out.toSeq == Seq(
      (1L, "Hà Nội", "2026-01-01", "2026-02-01"),      // closed old version
      (1L, "Hồ Chí Minh", "2026-02-01", null),         // new open version
      (2L, "Cà Mau", "2026-01-01", null),              // untouched
      (3L, "Huế", "2026-01-01", "2026-01-01"),         // closed history preserved
      (4L, "Đà Nẵng", "2026-02-01", null)))            // brand new
  }

  test("idempotent: re-applying the same snapshot changes nothing") {
    val once = Scd.type2(dim, updates, "CustomerID", Seq("City"), lit(d1))
    val twice = Scd.type2(once, updates, "CustomerID", Seq("City"),
      lit(Date.valueOf("2026-03-01")))
    assert(twice.exceptAll(once).count() == 0)
    assert(once.exceptAll(twice).count() == 0)
  }

  test("snapshotDiff classifies insert/update/delete and drops unchanged") {
    val oldSnap = Seq((1L, "a"), (2L, "b"), (3L, "c"),
      (4L, null.asInstanceOf[String])).toDF("k", "v")
    val newSnap = Seq((1L, "a"), (2L, "B"), (5L, "e"),
      (4L, null.asInstanceOf[String])).toDF("k", "v")
    val r = Scd.snapshotDiff(oldSnap, newSnap, "k", Seq("v"))
      .orderBy("k").select("k", "change_type")
      .as[(Long, String)].collect()
    // 1 unchanged (dropped), 4 null==null unchanged (dropped)
    assert(r.toSeq == Seq((2L, "update"), (3L, "delete"), (5L, "insert")))
  }

  test("snapshotDiff: null to value and value to null are updates") {
    val oldSnap = Seq((1L, null.asInstanceOf[String]), (2L, "x")).toDF("k", "v")
    val newSnap = Seq((1L, "y"), (2L, null.asInstanceOf[String])).toDF("k", "v")
    val r = Scd.snapshotDiff(oldSnap, newSnap, "k", Seq("v"))
      .orderBy("k").select("k", "change_type", "v")
      .as[(Long, String, Option[String])].collect()
    assert(r.toSeq == Seq((1L, "update", Some("y")), (2L, "update", None)))
  }

  private def cdcLog(rows: (Long, String, Long, String, Double)*) =
    rows.toSeq.toDF("user_id", "ts_s", "event_id", "event_type", "value")
      .select(col("user_id"), col("ts_s").cast("timestamp_ntz").as("ts"),
        col("event_id"), col("event_type"), col("value"))

  test("cdcApply: a trailing tombstone deletes; a later upsert resurrects") {
    val log = cdcLog(
      (1L, "2026-01-01 10:00:00", 1L, "signup", 10.0),
      (1L, "2026-01-01 11:00:00", 2L, "purchase", 20.0),
      (1L, "2026-01-01 12:00:00", 3L, "error", 0.0),     // dies deleted
      (2L, "2026-01-01 10:00:00", 4L, "signup", 5.0),
      (2L, "2026-01-01 11:00:00", 5L, "error", 0.0),
      (2L, "2026-01-01 12:00:00", 6L, "purchase", 30.0)) // resurrected
    val r = Scd.cdcApply(log)
      .select("user_id", "n_ops", "last_op", "deleted", "final_value")
      .as[(Long, Long, String, Int, Option[Double])].collect().toSeq
    assert(r == Seq(
      (1L, 3L, "D", 1, None),
      (2L, 3L, "U", 0, Some(30.0))))
  }

  test("cdcApply: timestamp ties break on event_id — the higher id wins") {
    val log = cdcLog(
      (7L, "2026-01-01 10:00:00", 5L, "view", 1.0),
      (7L, "2026-01-01 10:00:00", 9L, "view", 2.0))
    val r = Scd.cdcApply(log)
      .select("last_op", "final_value").as[(String, Option[Double])].head()
    assert(r == (("U", Some(2.0))))
  }

  test("mergeUpsert: conflicts detected per key, resolved by version, serial-equivalent") {
    // target keys 1..4 at 1.00; writes derive from the fixture orders:
    //   key 1: A(v2 U 2.00), B(v7 D)      -> conflict, delete wins (v7)
    //   key 2: A(v4 U 4.00)                -> updated, no conflict
    //   key 3: B(v3 U 3.00), A(v6 U 6.00)  -> conflict, v6 wins
    //   key 5: B(v5 U 5.00)                -> inserted (not in target)
    //   key 4: untouched                   -> kept
    val customer = Seq((1L, 1.0), (2L, 1.0), (3L, 1.0), (4L, 1.0))
      .toDF("c_custkey", "c_acctbal")
    val orders = Seq(
      (2L, 1L, 2.0), (7L, 1L, 7.0), (4L, 2L, 4.0),
      (3L, 3L, 3.0), (6L, 3L, 6.0), (5L, 5L, 5.0))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    val r = Scd.mergeUpsert(customer, orders)
      .select("key", "n_writes_a", "n_writes_b", "conflict", "winner_version",
        "final_state", "final_cents")
      .as[(Long, Long, Long, Boolean, Option[Long], String, Option[Long])]
      .collect().toSeq
    assert(r == Seq(
      (1L, 1L, 1L, true, Some(7L), "deleted", None),
      (2L, 1L, 0L, false, Some(4L), "updated", Some(400L)),
      (3L, 1L, 1L, true, Some(6L), "updated", Some(600L)),
      (4L, 0L, 0L, false, None, "kept", Some(100L)),
      (5L, 0L, 1L, false, Some(5L), "inserted", Some(500L))))
  }

  test("mergeUpsert equals the serial replay of all writes in version order") {
    // replay the same writes one at a time in version order into a map;
    // the set-based concurrent merge must land on the identical state
    val customer = (1L to 20L).map(k => (k, k.toDouble))
      .toDF("c_custkey", "c_acctbal")
    val orders = (1L to 60L).map(v => (v, (v * 13 % 25) + 1, v.toDouble))
      .toDF("o_orderkey", "o_custkey", "o_totalprice")
    var state = (1L to 20L).map(k => k -> Option(k * 100)).toMap
    (1L to 60L).foreach { v =>
      val key = (v * 13 % 25) + 1
      if (v % 7 == 0) state += key -> None              // tombstone
      else state += key -> Some(v * 100)                // absolute upsert
    }
    val merged = Scd.mergeUpsert(customer, orders)
      .select("key", "final_state", "final_cents")
      .as[(Long, String, Option[Long])].collect()
    merged.foreach { case (k, st, cents) =>
      val expected = state.getOrElse(k, None)
      if (st == "deleted") assert(expected.isEmpty, s"key $k: serial replay kept a value")
      else assert(cents == expected, s"key $k: $st $cents vs serial $expected")
    }
    assert(merged.map(_._1).toSet == state.keySet,
      "merge must cover exactly target ∪ written keys")
  }

  test("pointInTimeJoin: each order joins exactly its effective version") {
    // customer 4 is in the change cohort (4 % 4 == 0): nation 10 before
    // the cut, 11 after; customer 5 never changes. Orders straddle the
    // cut — the pre-cut order must land under the OLD nation.
    val cust = Seq((4L, 10L), (5L, 20L)).toDF("c_custkey", "c_nationkey")
    val orders = Seq(
      (1L, 4L, "1997-06-01", 100.0), // before cut → v1 nation 10
      (2L, 4L, "1998-06-01", 200.0), // after cut  → v2 nation 11
      (3L, 4L, "1998-01-01", 400.0), // AT the cut → v2 (from-inclusive)
      (4L, 5L, "1997-01-01", 800.0)) // never-changed → v1 nation 20
      .toDF("o_orderkey", "o_custkey", "d", "o_totalprice")
      .selectExpr("o_orderkey", "o_custkey",
        "CAST(d AS TIMESTAMP) AS o_orderdate", "o_totalprice")
    val r = Scd.pointInTimeJoin(orders, cust).collect()
      .map(x => (x.getAs[Long]("ver"), x.getAs[Long]("nation")) ->
        (x.getAs[Long]("n_orders"), x.getAs[Long]("total_cents"))).toMap
    assert(r == Map(
      (1L, 10L) -> ((1L, 10000L)),
      (2L, 11L) -> ((2L, 60000L)),
      (1L, 20L) -> ((1L, 80000L))))
    // coverage: the totals account for every order exactly once
    assert(r.values.map(_._1).sum == 4L)
  }
}
