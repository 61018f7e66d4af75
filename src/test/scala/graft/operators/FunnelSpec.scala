package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String, Long)*): DataFrame =
    // (event_id, user_id, event_type, ts_ms)
    rows.toDF("event_id", "user_id", "event_type", "ms")
      .selectExpr("event_id", "user_id", "event_type",
        "ms * 1000000 AS ts_ns", "CAST(10.0 AS DOUBLE) AS value")

  test("funnel: stages must happen in order; out-of-order events don't convert") {
    val e = ev(
      // user 1: view → click → purchase, fully converted
      (1L, 1L, "view", 100L), (2L, 1L, "click", 200L), (3L, 1L, "purchase", 300L),
      // user 2: purchase BEFORE first view → reaches view only
      (4L, 2L, "purchase", 50L), (5L, 2L, "view", 100L),
      // user 3: click before view, none after → stops at view
      (6L, 3L, "click", 10L), (7L, 3L, "view", 100L),
      // user 4: never views → not even in stage 1
      (8L, 4L, "click", 100L), (9L, 4L, "purchase", 200L))
    val r = Funnel.funnel(e).orderBy("stage_idx")
      .select("stage", "n_users").as[(String, Long)].collect()
    assert(r.toSeq == Seq(("view", 3L), ("click", 1L), ("purchase", 1L)))
  }

  test("funnel: same-ms stage events count (at-or-after, not strictly after)") {
    val e = ev((1L, 1L, "view", 100L), (2L, 1L, "click", 100L),
      (3L, 1L, "purchase", 100L))
    val r = Funnel.funnel(e).orderBy("stage_idx")
      .select("n_users").as[Long].collect()
    assert(r.toSeq == Seq(1L, 1L, 1L))
  }

  test("funnel: the earliest QUALIFYING stage event anchors the next stage") {
    // user clicks at 150 (after view@100), then purchases at 160: the click
    // at 50 (before the view) must not anchor, but the one at 150 must.
    val e = ev((1L, 1L, "click", 50L), (2L, 1L, "view", 100L),
      (3L, 1L, "click", 150L), (4L, 1L, "purchase", 160L))
    val r = Funnel.funnel(e).orderBy("stage_idx")
      .select("n_users").as[Long].collect()
    assert(r.toSeq == Seq(1L, 1L, 1L))
  }

  test("funnel rejects empty or duplicate stage lists") {
    val e = ev((1L, 1L, "view", 100L))
    intercept[IllegalArgumentException](Funnel.funnel(e, Seq.empty))
    intercept[IllegalArgumentException](Funnel.funnel(e, Seq("view", "view")))
  }

  test("retention: users bucket by first-event week; offsets count active weeks") {
    val wk = 604800000L
    val e = ev(
      // user 1: first in week 0, active weeks 0 and 2 (two events in wk2 → 1 count)
      (1L, 1L, "view", 0L), (2L, 1L, "view", 2 * wk), (3L, 1L, "click", 2 * wk + 5),
      // user 2: first in week 1, active weeks 1 and 2
      (4L, 2L, "view", wk + 3), (5L, 2L, "view", 2 * wk + 9))
    val r = Funnel.retention(e).orderBy("cohort_week", "week_offset")
      .select("cohort_week", "week_offset", "n_users")
      .as[(Long, Long, Long)].collect()
    assert(r.toSeq == Seq((0L, 0L, 1L), (0L, 2L, 1L), (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  private def evV(rows: (Long, Long, String, Long, Double)*): DataFrame =
    // (event_id, user_id, event_type, ts_ms, value)
    rows.toDF("event_id", "user_id", "event_type", "ms", "value")
      .selectExpr("event_id", "user_id", "event_type",
        "ms * 1000000 AS ts_ns", "value")

  test("attribution: earliest event picks the channel; spend follows the user") {
    val e = evV(
      // user 1: acquired via view; buys 10.50 + 2.25
      (1L, 1L, "view", 100L, 0.0), (2L, 1L, "purchase", 200L, 10.50),
      (3L, 1L, "purchase", 300L, 2.25),
      // user 2: acquired via click; never buys
      (4L, 2L, "click", 100L, 0.0),
      // user 3: first event IS a purchase → attributes to 'purchase'
      (5L, 3L, "purchase", 100L, 5.0))
    val r = Funnel.attribution(e).orderBy("channel")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(r == Seq(
      ("click", 1L, 0L, 0.0),
      ("purchase", 1L, 1L, 5.0),
      ("view", 1L, 1L, 12.75)))
  }

  test("attribution: same-ms first events tie-break by event_id") {
    val e = evV(
      (2L, 1L, "click", 100L, 0.0), (1L, 1L, "view", 100L, 0.0),
      (3L, 1L, "purchase", 200L, 1.0))
    val r = Funnel.attribution(e)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(r == Seq(("view", 1L, 1L, 1.0)))
  }

  test("funnel on real data: monotone non-increasing stage counts") {
    val events = graft.sources.TestData.events(spark, sf)
    val counts = Funnel.funnel(events).orderBy("stage_idx")
      .select("n_users").as[Long].collect()
    assert(counts.length == 3)
    assert(counts.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
    assert(counts.head > 0)
  }
}
