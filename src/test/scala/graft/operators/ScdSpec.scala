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
}
