package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String, Long)*): DataFrame =
    // (event_id, user_id, event_type, ts_ms)
    rows.toDF("event_id", "user_id", "event_type", "ms")
      .selectExpr("event_id", "user_id", "event_type",
        "ms * 1000000 AS ts_ns", "CAST(10.0 AS DOUBLE) AS value")

  private val day = 86400000L

  private def evD(rows: (Long, Long, String, Long, Double)*): DataFrame =
    // (event_id, user_id, event_type, ts_ms, value)
    rows.toDF("event_id", "user_id", "event_type", "ms", "value")
      .selectExpr("event_id", "user_id", "event_type",
        "ms * 1000000 AS ts_ns", "value")

  test("activeUsers: trailing window dedups a user active on several days") {
    val e = evD(
      (1L, 1L, "v", 0L, 0.0),           // user 1, day 0
      (2L, 1L, "v", 3 * day, 0.0),      // user 1, day 3
      (3L, 1L, "v", 3 * day + 5, 0.0),  // same user+day: no extra weight
      (4L, 2L, "v", 3 * day, 0.0))      // user 2, day 3
    val r = Events.activeUsers(e).orderBy("day")
      .as[(Long, Long, Long)].collect().toSeq
    // day 0: dau {1}; wau [-6..0] = {1}. day 3: dau {1,2}; wau [-3..3]
    // = {1,2} with user 1 counted ONCE despite two active days in window
    assert(r == Seq((0L, 1L, 1L), (3L, 2L, 2L)))
  }

  test("activeUsers: only observed days are emitted") {
    val e = evD((1L, 1L, "v", 0L, 0.0))
    val r = Events.activeUsers(e).as[(Long, Long, Long)].collect().toSeq
    assert(r == Seq((0L, 1L, 1L))) // no phantom rows for days 1..6
  }

  test("spendTrend: exact slope on a clean line; zero-variance type is NULL") {
    val e = evD(
      (1L, 1L, "A", 0L, 1.0), (2L, 1L, "A", day, 2.0),
      (3L, 1L, "A", 2 * day, 3.0),           // 100 cents/day exactly
      (4L, 1L, "B", 5 * day, 9.99), (5L, 2L, "B", 5 * day, 1.23))
    val r = Events.spendTrend(e).orderBy("event_type").collect()
    assert(r(0).getString(0) == "A" && r(0).getLong(1) == 3L
      && r(0).getDouble(2) == 100.0)
    assert(r(1).getString(0) == "B" && r(1).isNullAt(2))
  }

  test("spendTrend: slope is invariant to the absolute day offset") {
    def mk(off: Long) = evD(
      (1L, 1L, "A", off, 1.0), (2L, 1L, "A", off + day, 3.0))
    val a = Events.spendTrend(mk(0L)).collect()(0).getDouble(2)
    val b = Events.spendTrend(mk(19000L * day)).collect()(0).getDouble(2)
    assert(a == 200.0 && b == 200.0)
  }

  test("markovTransitions: per-user sequences, exact conditional ratios") {
    val e = ev(
      // user 1: a -> b -> a  (transitions a->b, b->a)
      (1L, 1L, "a", 100L), (2L, 1L, "b", 200L), (3L, 1L, "a", 300L),
      // user 2: a -> a       (transition a->a)
      (4L, 2L, "a", 100L), (5L, 2L, "a", 200L),
      // user 3: single event -> no transition
      (6L, 3L, "b", 100L))
    val r = Events.markovTransitions(e).orderBy("prev_type", "next_type")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(r == Seq(
      ("a", "a", 1L, 0.5), ("a", "b", 1L, 0.5), ("b", "a", 1L, 1.0)))
  }

  test("markovTransitions: same-ms events order by event_id (no cross-user leaks)") {
    val e = ev(
      (2L, 1L, "y", 100L), (1L, 1L, "x", 100L), // same ms: x (id 1) first
      (3L, 2L, "z", 100L))
    val r = Events.markovTransitions(e)
      .as[(String, String, Long, Double)].collect().toSeq
    assert(r == Seq(("x", "y", 1L, 1.0)))
  }

  test("sessionize: gap strictly greater than threshold starts a new session") {
    val gap = 30 * 60000L
    val e = ev(
      (1L, 1L, "click", 0L),
      (2L, 1L, "click", gap),          // exactly 30 min later → SAME session (> not >=)
      (3L, 1L, "click", 2 * gap + 1),  // 30 min + 1 ms after prev → new session
      (4L, 2L, "click", 5L))           // other user → own session
    val s = Events.sessionize(e).orderBy("user_id", "session_seq")
      .select("user_id", "session_seq", "n_events").as[(Long, Long, Long)].collect()
    assert(s.toSeq == Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 1L, 1L)))
  }

  test("as-of join: purchase takes the latest signup at-or-before it") {
    val e = ev(
      (1L, 1L, "signup", 100L),
      (2L, 1L, "signup", 500L),
      (3L, 1L, "purchase", 500L),   // signup at the same ms counts
      (4L, 1L, "purchase", 300L),   // only the 100-ms signup is before
      (5L, 2L, "purchase", 999L))   // no signup at all → null
    val r = Events.asOfLastSignup(e).orderBy("event_id")
      .select("event_id", "last_signup_ms").collect()
      .map(row => (row.getLong(0), if (row.isNullAt(1)) None else Some(row.getLong(1))))
    assert(r.toSeq == Seq((3L, Some(500L)), (4L, Some(100L)), (5L, None)))
  }

  test("native session_window agrees with the lag formulation on real data") {
    val events = graft.sources.TestData.events(spark, sf)
    val native = Events.sessionizeNative(events)
      .select("user_id", "n_events", "start_ms", "end_ms")
    val lagBased = Events.sessionize(events)
      .select("user_id", "n_events", "start_ms", "end_ms")
    assert(native.count() > 0)
    assert(native.exceptAll(lagBased).count() == 0)
    assert(lagBased.exceptAll(native).count() == 0)
  }

  test("approx_count_distinct within 5% of exact on event users") {
    import org.apache.spark.sql.functions._
    val events = graft.sources.TestData.events(spark, sf)
    val r = events.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id")).as("approx")).head()
    val (exact, approx) = (r.getLong(0).toDouble, r.getLong(1).toDouble)
    assert(math.abs(approx - exact) / exact <= 0.05)
  }

  test("pivot: absent event types come back as zero, not null") {
    val e = ev((1L, 1L, "click", 0L), (2L, 1L, "click", 1L), (3L, 1L, "purchase", 2L))
    val row = Events.pivotCounts(e).head()
    assert(row.getAs[Long]("click") == 2L)
    assert(row.getAs[Long]("purchase") == 1L)
    assert(row.getAs[Long]("signup") == 0L)
  }

  test("q85 positional median equals Spark's built-in median, even and odd groups") {
    // independent implementations: the q85 row_number selection vs the
    // native median aggregate — a shared-formula bug in the query+oracle
    // pair (the review-caught even-group defect) cannot fool this check
    import org.apache.spark.sql.functions.{col, median}
    val q85 = graft.SparkEntry.queries("q85_exact_median")(spark, sf)
      .as[(String, Double)].collect().toMap
    val builtin = graft.sources.TestData.events(spark, sf)
      .groupBy("event_type").agg(median(col("value")).as("m"))
      .as[(String, Double)].collect().toMap
    assert(q85.nonEmpty && q85.keySet == builtin.keySet)
    q85.foreach { case (t, m) => assert(m == builtin(t), s"median mismatch for $t") }
    // the corpus must actually exercise the even-group path
    val parities = graft.sources.TestData.events(spark, sf)
      .groupBy("event_type").count().as[(String, Long)].collect().map(_._2 % 2).toSet
    assert(parities.contains(0L), "need at least one even-sized group")
  }

  test("hourlyBursts: trailing range window spans gaps, score is exact") {
    val h = 3600000L
    val e = evD(
      (1L, 1L, "v", 0L, 0.0), (2L, 2L, "v", 5L, 0.0), // hour 0: n=2
      (3L, 1L, "v", h, 0.0),                          // hour 1: n=1
      (4L, 1L, "v", 3 * h, 0.0), (5L, 2L, "v", 3 * h + 1, 0.0),
      (6L, 3L, "v", 3 * h + 2, 0.0))                  // hour 3: n=3
    val r = Events.hourlyBursts(e, windowHours = 2).orderBy("hour")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    // hour 0: trail {h0}=2; hour 1: trail {h0,h1}=3; hour 3: the RANGE
    // frame [2,3] contains no hour-2 row -> trail {h3}=3
    assert(r == Seq(
      (0L, 2L, 2L, 1L, 2.0),
      (1L, 1L, 3L, 2L, 2.0 / 3.0),
      (3L, 3L, 3L, 1L, 2.0)))
  }

  test("latenessAudit: exact bands on a constructed out-of-order stream") {
    // user 1 arrival order (by event_id): t=1000, 5000, 4500 (500ms late),
    // 5000 (on time, ties at max), 4999999 ... then one > 1h late;
    // user 2 strictly ordered -> all on_time; first events are on_time
    val e = ev(
      (1L, 1L, "a", 1000L), (2L, 1L, "a", 5000L), (3L, 1L, "a", 4500L),
      (4L, 1L, "a", 5000L), (5L, 1L, "b", 4000000L), (6L, 1L, "b", 1000L),
      (7L, 2L, "a", 10L), (8L, 2L, "a", 20L))
    val r = Events.latenessAudit(e)
      .select("event_type", "band", "n", "max_late_ms")
      .as[(String, String, Long, Long)].collect().toSet
    assert(r == Set(
      ("a", "on_time", 5L, 0L),     // ids 1,2,4 (tie), 7, 8
      ("a", "under_1s", 1L, 500L),  // id 3: 5000-4500
      ("b", "on_time", 1L, 0L),     // id 5 advances the max
      ("b", "over_1h", 1L, 3999000L))) // id 6: 4000000-1000 > 1h
  }

  test("latenessAudit: fully ordered stream reports 100% on_time (the real feed)") {
    val r = Events.latenessAudit(graft.sources.TestData.events(spark, sf))
      .select("band", "max_late_ms").as[(String, Long)].collect()
    assert(r.nonEmpty)
    r.foreach { case (b, m) => assert(b == "on_time" && m == 0L) }
  }

  test("activityIslands: exact islands on constructed day patterns") {
    // user 1 active days 0,1,2, 5, 10,11 -> islands (0-2), (5), (10-11)
    // user 2 active day -3 only          -> island (-3)
    val e = ev(
      (1L, 1L, "a", 0L), (2L, 1L, "a", 1L), // two events on day 0: dedups
      (3L, 1L, "a", day), (4L, 1L, "a", 2 * day),
      (5L, 1L, "a", 5 * day),
      (6L, 1L, "a", 10 * day), (7L, 1L, "a", 11 * day),
      (8L, 2L, "a", -3 * day))
    val r = Events.activityIslands(e)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(r == Set(
      (1L, 0L, 2L, 3L), (1L, 5L, 5L, 1L), (1L, 10L, 11L, 2L),
      (2L, -3L, -3L, 1L)))
  }

  test("latenessDisordered: md5 permutation exercises the late bands on the real feed") {
    val r = Events.latenessDisordered(graft.sources.TestData.events(spark, sf))
      .select("band", "n").as[(String, Long)].collect()
    val bands = r.map(_._1).toSet
    // a pseudo-random arrival order over a multi-day feed must produce
    // genuinely late rows, not just on_time — and late rows must dominate
    assert(bands.size >= 2, s"expected several lateness bands, got $bands")
    val late = r.filter(_._1 != "on_time").map(_._2).sum
    val onTime = r.filter(_._1 == "on_time").map(_._2).sum
    assert(late > onTime, s"md5 disorder should make most rows late (late=$late on_time=$onTime)")
  }

  test("gapFillDaily: quiet days 0-fill flows, LOCF the type, count staleness") {
    val e = evD(
      (1L, 1L, "signup", 0L, 5.0),          // day 0
      (2L, 1L, "click", 10L, 7.0),          // day 0 (later -> day's type)
      (3L, 1L, "purchase", 3 * day + 1L, 9.0)) // day 3; days 1,2 quiet
    val rows = Events.gapFillDaily(e).collect()
      .map(r => r.getLong(1) -> ((r.getLong(2), r.getLong(3), r.getString(4), r.getInt(5))))
      .toMap
    assert(rows.keySet === Set(0L, 1L, 2L, 3L), "the grid must densify the gap")
    assert(rows(0L) === ((1200L, 2L, "click", 0)),
      "day 0: cents sum, count, LAST event's type, fresh")
    assert(rows(1L) === ((0L, 0L, "click", 1)), "quiet day: 0-filled + LOCF + stale 1")
    assert(rows(2L) === ((0L, 0L, "click", 2)))
    assert(rows(3L) === ((900L, 1L, "purchase", 0)), "activity resets staleness")
  }
  test("seasonalDecompose: a pure weekly pattern yields zero residuals and NULL edges") {
    // 28 days, one event per day, value = 10 + (day % 7) dollars — a
    // constant trend plus a pure weekly pattern. Interior days must
    // decompose exactly: the 7-day trend sum is constant, the seasonal
    // term absorbs the whole pattern, and every residual is 0.0. The
    // first and last 3 days lack a full window and must carry NULLs.
    val rows = (0L until 28L).map { d =>
      (d + 1, 1L, "v", d * day, 10.0 + (d % 7).toDouble)
    }
    val r = Events.seasonalDecompose(evD(rows: _*)).collect()
      .map(x => x.getAs[Long]("day") % 28 -> x).sortBy(_._1)
    assert(r.length == 28)
    for ((d, row) <- r) {
      if (d < 3 || d > 24) {
        assert(row.isNullAt(row.fieldIndex("trend7")), s"day $d edge trend")
        assert(row.isNullAt(row.fieldIndex("residual7")), s"day $d edge residual")
      } else {
        // constant trend: sum of any 7 consecutive = 7*1000 + sum(0..6)*100
        assert(row.getAs[Long]("trend7") == 7 * 1000L + 2100L, s"day $d trend")
        assert(row.getAs[Double]("residual7") == 0.0, s"day $d residual")
      }
    }
    // the seasonal terms sum to zero across the week (mean-centered)
    val seasonals = r.map(_._2.getAs[Double]("seasonal7")).distinct
    assert(math.abs(seasonals.sum) < 1e-9, s"seasonal must center: $seasonals")
  }

  test("residualAnomalies: a zero-MAD series flags nothing (no division)") {
    // the pure weekly pattern above: every interior residual is exactly
    // 0.0, so median = MAD = 0 and |dev| > 3·0 must flag NO day — the
    // multiplication-form fence handles the degenerate scale where a
    // z-score would divide by zero
    val rows = (0L until 28L).map { d =>
      (d + 1, 1L, "v", d * day, 10.0 + (d % 7).toDouble)
    }
    assert(Events.residualAnomalies(evD(rows: _*)).count() == 0)
  }

  test("residualAnomalies: an injected spike day is flagged") {
    // same weekly pattern plus one +700-dollar spike on day 17; the
    // anomaly set must contain day 17, and only days the spike can
    // perturb may flag: days whose 7-day trend window touches it
    // (14..20) and days sharing its weekday (the polluted seasonal
    // mean: 3, 10, 24). Every other day's residual is exactly the
    // (small) seasonal pollution shared by its whole weekday class.
    val rows = (0L until 28L).map { d =>
      val spike = if (d == 17L) 700.0 else 0.0
      (d + 1, 1L, "v", d * day, 10.0 + (d % 7).toDouble + spike)
    }
    val flagged = Events.residualAnomalies(evD(rows: _*)).collect()
      .map(_.getAs[Long]("day")).toSet
    assert(flagged.contains(17L), s"spike day must be flagged: $flagged")
    val perturbable = (14L to 20L).toSet ++ Set(3L, 10L, 24L)
    assert(flagged.subsetOf(perturbable),
      s"only spike-perturbed days may flag: $flagged")
  }

  test("q285: holding intervals weight the mean; bursts do not distort it") {
    // user 1: value 10.0 held for 9s, then value 100.0 for the final 1s
    // sampled ten times in a burst — plain AVG ≈ 91.8, TWAP = 19.0
    val rows = Seq((1L, 1L, 0L, 10.0)) ++
      (0 until 10).map(i => (10L + i, 1L, 9000L + i * 100, 100.0)) ++
      Seq((99L, 1L, 10000L, 100.0)) ++
      Seq((200L, 2L, 0L, 5.0)) // single event: no interval, excluded
    val e = rows.map { case (id, u, ms, v) => (id, u, ms, v) }
      .toDF("event_id", "user_id", "ms", "value")
      .selectExpr("event_id", "user_id", "ms * 1000000 AS ts_ns", "value")
    val r = Events.timeWeightedAverage(e).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3),
        x.getDouble(4)))).toMap
    // wsum = 1000c*9000ms + 10000c*(100ms*10) = 9e6 + 1e7 = 1.9e7; span 1e4
    assert(r(1L) == ((12L, 10000L, 19000000L, 1900.0)), r.get(1L))
    assert(!r.contains(2L), "single-sample user has no held interval")
  }

  test("q275: the window closed form equals the sequential CUSUM recurrence") {
    // 20 quiet days (10/day) then a sustained shift (30/day for 10 days)
    val counts = Seq.fill(20)(10) ++ Seq.fill(10)(30)
    val rows = counts.zipWithIndex.flatMap { case (c, d) =>
      (0 until c).map(i => ((d * 1000 + i).toLong, 1L, "v",
        d.toLong * 86400000L + i)) }
    val e = ev(rows: _*)
    val got = Events.cusumChangepoints(e).collect()
      .map(x => x.getLong(0) -> ((x.getLong(2), x.getBoolean(3)))).toMap
    // independent reference: the literal max(0, ...) fold
    val total = counts.map(_.toLong).sum; val nd = counts.length.toLong
    var c = 0L
    val expect = counts.zipWithIndex.map { case (n, d) =>
      c = math.max(0L, c + (n * nd - total - total / 4))
      d.toLong -> ((c, c > 2 * total))
    }.toMap
    assert(got == expect, s"got $got\nexpect $expect")
    // the shift accumulates into flags the single-day outlier rule misses
    assert(got.values.count(_._2) > 0, "sustained shift must flag")
    assert(!got(19L)._2 && got(29L)._2)
  }

  test("q273: rise-then-drop patterns — strictness, minimum length, trailing rise") {
    // per user: a value sequence in event_id order, one event per second
    def seq(uid: Long, vals: Double*): Seq[(Long, Long, Long, Double)] =
      vals.zipWithIndex.map { case (v, i) =>
        (uid * 100 + i, uid, i.toLong * 1000, v) }
    val rows =
      seq(1, 1, 2, 3, 4, 2) ++ // 3 U-steps then D: one pattern, peak 4
      seq(2, 1, 2, 3, 4) ++    // trailing rise, never dropped: no match
      seq(3, 1, 2, 3, 2, 1, 2, 3, 4, 3) ++ // len-2 run no; len-3 run yes
      seq(4, 5, 5, 5, 5, 1) ++ // flat steps are not rises
      seq(5, 1, 2, 3, 3, 4, 5, 6, 2) // plateau SPLITS the run; 2nd run matches
    val e = rows.toDF("event_id", "user_id", "ms", "value")
      .selectExpr("event_id", "user_id",
        "timestamp_micros(ms * 1000) AS ts", "value")
    val r = Events.risePatterns(e).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3))))
      .toMap
    assert(r == Map(
      1L -> ((1L, 3L, 400L)),
      3L -> ((1L, 3L, 400L)),
      5L -> ((1L, 3L, 600L))), s"got $r")
  }

  test("q291: hand-counted Mann-Whitney pairs, and the 1.0 / 0.5 / 0.0 anchors") {
    import org.apache.spark.sql.functions.col
    def fx(rows: (String, Double)*): DataFrame =
      rows.zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) }
        .toDF("event_id", "event_type", "value")
    // A scores {3, 2} vs B scores {1, 2}: concordant pairs (3,1)(3,2)
    // (2,1) = 3, tied pairs (2,2) = 1 -> u2 = 7, auc = 7/8
    val r = Events.rocAucByType(fx(("A", 3.0), ("A", 2.0), ("B", 1.0),
        ("B", 2.0)))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4)))).toMap
    assert(r("A") == ((2L, 2L, 7L, 0.875)), s"got ${r("A")}")
    // the complement: B's u2 must mirror A's (2*n1*n0 - 7 = 1)
    assert(r("B") == ((2L, 2L, 1L, 0.125)), s"got ${r("B")}")
    // perfect separation = 1.0 exactly; identical scores = 0.5 exactly
    val sep = Events.rocAucByType(fx(("A", 9.0), ("A", 8.0), ("B", 1.0)))
      .collect().map(x => x.getString(0) -> x.getDouble(4)).toMap
    assert(sep("A") == 1.0 && sep("B") == 0.0, s"got $sep")
    val flat = Events.rocAucByType(fx(("A", 5.0), ("B", 5.0), ("B", 5.0)))
      .collect().map(x => x.getString(0) -> x.getDouble(4)).toMap
    assert(flat("A") == 0.5 && flat("B") == 0.5, s"got $flat")
    // cross-bucket exactness: scores straddling the 10000-cent coarse
    // grid must count strictly-below negatives across buckets
    val wide = Events.rocAucByType(fx(("A", 250.0), ("B", 50.0)))
      .filter(col("event_type") === "A").head().getDouble(4)
    assert(wide == 1.0, s"cross-bucket pair lost: $wide")
    // a single-class input has no negatives: AUC is NULL, never 0/0 NaN
    val mono = Events.rocAucByType(fx(("A", 3.0), ("A", 1.0))).head()
    assert(mono.getLong(2) == 0L && mono.isNullAt(4),
      s"single-class AUC must be NULL: $mono")
  }

  test("q303: hand-walked PR curve — inclusive cuts, tied scores, and the cross-bucket cumulative") {
    def fx(rows: (String, Double)*): DataFrame =
      rows.zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) }
        .toDF("event_id", "event_type", "value")
    // scores descending: A@3.00, B@2.00, A@2.00, B@1.00 (tie at 2.00)
    val r = Events.prCurveByType(fx(("A", 3.0), ("B", 2.0), ("A", 2.0),
        ("B", 1.0)))
      .collect().map(x => (x.getString(0), x.getLong(1)) ->
        ((x.getLong(3), x.getLong(4), x.getDouble(6), x.getDouble(7))))
      .toMap
    // cut A@300: >=300 is 1 row, 1 A -> P=1, R=1/2
    assert(r(("A", 300L)) == ((1L, 1L, 1.0, 0.5)), s"got ${r(("A", 300L))}")
    // cut A@200: >=200 is 3 rows (tie counted whole), 2 A -> P=2/3, R=1
    assert(r(("A", 200L)) == ((3L, 2L, 2.0 / 3.0, 1.0)))
    // cut B@200: same cum_n, 1 B -> P=1/3, R=1/2
    assert(r(("B", 200L)) == ((3L, 1L, 1.0 / 3.0, 0.5)))
    // cut B@100: all 4 rows, 2 B -> P=1/2, R=1
    assert(r(("B", 100L)) == ((4L, 2L, 0.5, 1.0)))
    // cross-bucket: scores straddling the 10000-cent coarse grid must
    // accumulate cum_n across buckets (250.00 -> bucket -3, 50.00 -> -1)
    val wide = Events.prCurveByType(fx(("A", 250.0), ("B", 50.0)))
      .collect().map(x => (x.getString(0), x.getLong(1)) -> x.getLong(3))
      .toMap
    assert(wide(("B", 5000L)) == 2L,
      s"cross-bucket cum_n lost a row: $wide")
  }

  test("q292: bin edges are integer-exact, the top score lands in bin 9, stats hand-check") {
    def fx(rows: (String, Double)*): DataFrame =
      rows.zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) }
        .toDF("event_id", "event_type", "value")
    // max = 10.00 -> bin = (10*cents) DIV 1000 clamped: 10.00 -> 10 -> 9
    // (the top edge closes), 9.99 -> 9, 1.00 -> 1, 0.99 -> 0
    val r = Events.calibrationBins(fx(("purchase", 10.0), ("view", 9.99),
        ("purchase", 1.0), ("view", 0.99)))
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r.keySet == Set(0L, 1L, 9L), s"got ${r.keySet}")
    assert(r(9L) == ((2L, 1L, 1999L)), s"top bin: ${r(9L)}")
    assert(r(1L) == ((1L, 1L, 100L)) && r(0L) == ((1L, 0L, 99L)))
    // a perfectly calibrated bin has zero gap: 2 rows at the max score,
    // both... one purchase of two -> obs 0.5; mean_pred = 1.0 -> gap 0.5
    val g = Events.calibrationBins(fx(("purchase", 5.0), ("view", 5.0)))
      .head()
    assert(g.getAs[Double]("mean_pred") == 1.0
      && g.getAs[Double]("obs_rate") == 0.5
      && g.getAs[Double]("abs_gap") == 0.5, s"got $g")
    // degenerate score domain (max <= 0): one bin-0 row, NULL mean_pred —
    // never an integer division by zero
    val z = Events.calibrationBins(fx(("purchase", 0.0), ("view", 0.0)))
      .collect()
    assert(z.length == 1 && z.head.getLong(0) == 0L
      && z.head.isNullAt(4) && z.head.getAs[Double]("obs_rate") == 0.5,
      s"degenerate domain: ${z.toSeq}")
  }

  test("q305: hand-computed Brier scores, the absent-class anchor, and the degenerate-domain NULL") {
    def fx(rows: (String, Double)*): DataFrame =
      rows.zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) }
        .toDF("event_id", "event_type", "value")
    // cents (1000, 500), M=1000: p = (1.0, 0.5)
    //   purchase y=(1,0): ((1-1)^2 + (0.5-0)^2)/2 = 0.125
    //   view     y=(0,1): ((1-0)^2 + (0.5-1)^2)/2 = 0.625
    //   click (absent):   ((1)^2 + (0.5)^2)/2    = 0.625, n_pos = 0
    val r = Events.brierByType(fx(("purchase", 10.0), ("view", 5.0)))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(2), x.getLong(3), x.getDouble(4)))).toMap
    assert(r("purchase") == ((1L, 250000L, 0.125)), s"got ${r("purchase")}")
    assert(r("view") == ((1L, 1250000L, 0.625)), s"got ${r("view")}")
    assert(r("click") == ((0L, 1250000L, 0.625)),
      s"absent class must anchor: ${r("click")}")
    // degenerate domain (max <= 0): NULL, never a division by zero
    val z = Events.brierByType(fx(("purchase", 0.0), ("view", 0.0))).head()
    assert(z.isNullAt(4), s"degenerate Brier must be NULL: $z")
  }

  test("q307: hand-computed kappa off the band classifier, and the chance-saturated NULL") {
    def fx(rows: (String, Double)*): DataFrame =
      rows.zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) }
        .toDF("event_id", "event_type", "value")
    // bands: 10.00 -> click, 100.00 -> error. Rows: click/10 (tp),
    // error/100 (tp), purchase/100 (pred error, miss). n=3, agree=2,
    // chance = 1*1 (click) + 2*1 (error) = 3
    // kappa = (3*2 - 3) / (9 - 3) = 0.5; p_o = 2/3, p_e = 1/3
    val r = Events.cohensKappa(fx(("click", 10.0), ("error", 100.0),
      ("purchase", 100.0))).head()
    assert(r.getLong(0) == 3L && r.getLong(1) == 2L && r.getLong(2) == 3L,
      s"counts: $r")
    assert(r.getDouble(3) == 2.0 / 3.0 && r.getDouble(4) == 1.0 / 3.0
      && r.getDouble(5) == 0.5, s"kappa: $r")
    // chance saturation: every marginal in one class -> n^2 = chance,
    // kappa undefined -> NULL (never 0/0)
    val z = Events.cohensKappa(fx(("click", 1.0), ("click", 2.0))).head()
    assert(z.getLong(1) == 2L && z.getLong(2) == 4L && z.isNullAt(5),
      s"saturated kappa must be NULL: $z")
  }

  test("q294: hand-walked deciles, cumulative capture/lift, and tied groups staying whole") {
    def fx(rows: (String, Double)*): DataFrame =
      rows.zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) }
        .toDF("event_id", "event_type", "value")
    // 5 distinct scores -> cum_before 0..4 -> deciles 0,2,4,6,8
    val r = Events.gainLift(fx(("purchase", 10.0), ("view", 9.0),
        ("purchase", 8.0), ("view", 7.0), ("view", 6.0)))
      .collect().map(x => x.getLong(0) ->
        ((x.getLong(3), x.getLong(4), x.getDouble(5), x.getDouble(6))))
      .toMap
    assert(r.keySet == Set(0L, 2L, 4L, 6L, 8L), s"deciles: ${r.keySet}")
    assert(r(0L) == ((1L, 1L, 0.5, 2.5)), s"top decile: ${r(0L)}")
    assert(r(4L) == ((3L, 2L, 1.0, 10.0 / 6.0)), s"mid: ${r(4L)}")
    assert(r(8L) == ((5L, 2L, 1.0, 1.0)), s"tail: ${r(8L)}")
    // one giant tied group: ties stay whole in decile 0, lift exactly 1
    val tied = Events.gainLift(fx(("purchase", 5.0), ("view", 5.0),
      ("view", 5.0), ("view", 5.0))).collect()
    assert(tied.length == 1 && tied.head.getLong(0) == 0L)
    assert(tied.head.getDouble(5) == 1.0 && tied.head.getDouble(6) == 1.0)
  }

  test("q299: hand-built confusion matrix, static-class anchor, and the 0/0 NULL") {
    def fx(rows: (String, Double)*): DataFrame =
      rows.zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) }
        .toDF("event_id", "event_type", "value")
    // bands (cents): [0,5000) click, [5000,15000) error, [15000,30000)
    // purchase. Fixture: click@10 (tp), click@60 (pred error -> click fn,
    // error fp), error@70 (tp), purchase@160 (tp), purchase@20 (pred
    // click -> purchase fn, click fp). signup/view absent entirely.
    val r = Events.classifierEval(fx(("click", 10.0), ("click", 60.0),
        ("error", 70.0), ("purchase", 160.0), ("purchase", 20.0)))
      .collect().map(x => x.getString(0) ->
        ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r.keySet.size == 6, s"5 classes + micro: ${r.keySet}")
    assert(r("click") == ((1L, 1L, 1L)), s"click: ${r("click")}")
    assert(r("error") == ((1L, 1L, 0L)), s"error: ${r("error")}")
    assert(r("purchase") == ((1L, 0L, 1L)), s"purchase: ${r("purchase")}")
    assert(r("signup") == ((0L, 0L, 0L)) && r("view") == ((0L, 0L, 0L)),
      "absent classes anchor with zero counts")
    assert(r("zz_micro") == ((3L, 2L, 2L)), s"micro: ${r("zz_micro")}")
    // metric spot checks: error precision 1/2, recall 1/1, f1 2/3;
    // absent classes report NULL (0/0), never 0.0 or a crash
    val m = Events.classifierEval(fx(("click", 10.0), ("click", 60.0),
        ("error", 70.0), ("purchase", 160.0), ("purchase", 20.0)))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(m("error").getDouble(4) == 0.5
      && m("error").getDouble(5) == 1.0
      && m("error").getDouble(6) == 2.0 / 3.0, s"error: ${m("error")}")
    assert(m("signup").isNullAt(4) && m("signup").isNullAt(5)
      && m("signup").isNullAt(6), "0/0 must be NULL")
    assert(m("zz_micro").getDouble(4) == 0.6, s"micro p: ${m("zz_micro")}")
  }

  test("q301: MCC matches the same-op-order scala reference; degenerate classes are NULL") {
    def fx(rows: (String, Double)*): DataFrame =
      rows.zipWithIndex.map { case ((t, v), i) => (i.toLong, t, v) }
        .toDF("event_id", "event_type", "value")
    // same fixture as q299: click tp=1 fp=1 fn=1 tn=2 over n=5
    val r = Events.mccPerClass(fx(("click", 10.0), ("click", 60.0),
        ("error", 70.0), ("purchase", 160.0), ("purchase", 20.0)))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r.keySet.size == 5, "per-class only, no micro row")
    def refMcc(tp: Long, fp: Long, fn: Long, tn: Long): Double =
      (tp * tn - fp * fn).toDouble /
        (math.sqrt((tp + fp).toDouble) * math.sqrt((tp + fn).toDouble) *
          math.sqrt((tn + fp).toDouble) * math.sqrt((tn + fn).toDouble))
    assert(r("click").getAs[Long]("tn") == 2L, s"tn: ${r("click")}")
    assert(r("click").getAs[Double]("mcc") == refMcc(1, 1, 1, 2),
      s"click mcc: ${r("click")}")
    assert(r("error").getAs[Double]("mcc") == refMcc(1, 1, 0, 3))
    // a class never predicted AND never labeled: tp+fp = 0 -> NULL
    assert(r("signup").isNullAt(5) && r("view").isNullAt(5),
      "degenerate classes must report NULL, not 0/0")
    // perfect classifier -> MCC == the same-op-order reference of a
    // perfect confusion square (sqrt(2)*sqrt(2) != 2 exactly in IEEE,
    // so the honest assertion is op-order equality, within 1e-15 of 1)
    val p = Events.mccPerClass(fx(("click", 10.0), ("error", 70.0),
        ("purchase", 160.0)))
      .collect().map(x => x.getString(0) -> x).toMap
    for (c <- Seq("click", "error", "purchase")) {
      val got = p(c).getAs[Double]("mcc")
      assert(got == refMcc(1, 0, 0, 2), s"$c: ${p(c)}")
      assert(math.abs(got - 1.0) < 1e-15, s"$c must be ~1: $got")
    }
  }

  test("q314: the one-pass report reproduces every standalone metric bit-for-bit") {
    val events = graft.sources.TestData.events(spark, sf)
    val rep = Events.evalReport(events).collect()
      .map(r => r.getString(0) -> r).toMap
    def nd(r: org.apache.spark.sql.Row, f: String): Option[Double] = {
      val i = r.fieldIndex(f)
      if (r.isNullAt(i)) None else Some(r.getDouble(i))
    }
    // AUC column == q291 per type
    Events.rocAucByType(events).collect().foreach { a =>
      assert(nd(rep(a.getString(0)), "auc") == nd(a, "auc"),
        s"auc(${a.getString(0)})")
    }
    // Brier column == q305 per class
    Events.brierByType(events).collect().foreach { b =>
      assert(nd(rep(b.getString(0)), "brier") == nd(b, "brier"),
        s"brier(${b.getString(0)})")
    }
    // confusion + P/R/F1 == q299 per class (micro row excluded)
    Events.classifierEval(events)
      .filter(org.apache.spark.sql.functions.col("cls") =!= "zz_micro")
      .collect().foreach { c =>
      val r = rep(c.getString(0))
      for (f <- Seq("tp", "fp", "fn"))
        assert(r.getAs[Long](f) == c.getAs[Long](f),
          s"$f(${c.getString(0)})")
      for (f <- Seq("precision", "recall", "f1"))
        assert(nd(r, f) == nd(c, f), s"$f(${c.getString(0)})")
    }
    // MCC + tn == q301 per class
    Events.mccPerClass(events).collect().foreach { m =>
      val r = rep(m.getString(0))
      assert(r.getAs[Long]("tn") == m.getAs[Long]("tn"),
        s"tn(${m.getString(0)})")
      assert(nd(r, "mcc") == nd(m, "mcc"), s"mcc(${m.getString(0)})")
    }
    // n is the class's row count and the report covers the static list
    assert(rep.keySet == Set("click", "error", "purchase", "signup",
      "view"))
    assert(rep.values.map(_.getAs[Long]("n")).sum == events.count())
  }

  test("q315: the delta-merged grain is indistinguishable from a full rebuild") {
    import org.apache.spark.sql.functions.col
    val events = graft.sources.TestData.events(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("graft-q315-spec")
    try {
      val got = Events.incrementalEvalReport(events, s"$out/eval_grain")
        .collect()
      def key(r: org.apache.spark.sql.Row) =
        (r.getString(0), r.getString(1))
      val byStage = got.groupBy(_.getString(0))
      // stage b (merged) must equal the full rebuild EXACTLY, column
      // for column — the maintained artifact is indistinguishable
      val full = Events.evalReport(events).collect()
        .map(r => r.getString(0) -> r).toMap
      byStage("b_merged").foreach { r =>
        val f = full(r.getString(1))
        (1 until r.length).foreach { i =>
          assert(r.get(i) == f.get(i - 1),
            s"merged(${key(r)}) field $i: ${r.get(i)} vs ${f.get(i - 1)}")
        }
      }
      // stage a must equal the report over the base split alone
      val base = Events.evalReport(
        events.filter(col("event_id") % 7L =!= 1L)).collect()
        .map(r => r.getString(0) -> r).toMap
      byStage("a_base").foreach { r =>
        val f = base(r.getString(1))
        (1 until r.length).foreach { i =>
          assert(r.get(i) == f.get(i - 1), s"base(${key(r)}) field $i")
        }
      }
      // the persisted artifact is the base grain, bounded by the
      // (type, distinct-cent) cardinality — not by rows
      val grain = spark.read.parquet(s"$out/eval_grain/grain/v1")
      assert(grain.count() ==
        events.filter(col("event_id") % 7L =!= 1L)
          .selectExpr("event_type",
            "CAST(FLOOR(CAST(value AS DOUBLE) * 100) AS BIGINT) AS s")
          .distinct().count())
      // the delta genuinely contributed: merged n exceeds base n
      val nOf = (st: String) =>
        byStage(st).map(_.getAs[Long]("n")).sum
      assert(nOf("b_merged") == events.count())
      assert(nOf("a_base") < nOf("b_merged"))
      // BOOTSTRAP vs MAINTENANCE: a second run against the existing
      // artifact must REUSE the base grain byte-for-byte (no history
      // rescan rewrites it) while the maintained v2 grain is re-landed
      def listing(p: String) = new java.io.File(p).listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.lastModified()).toMap
      val v1Before = listing(s"$out/eval_grain/grain/v1")
      val v2Before = listing(s"$out/eval_grain/grain/v2")
      val again = Events.incrementalEvalReport(events, s"$out/eval_grain")
        .collect()
      assert(listing(s"$out/eval_grain/grain/v1") == v1Before,
        "the bootstrap artifact must be reused, never rewritten")
      assert(listing(s"$out/eval_grain/grain/v2") != v2Before,
        "the maintained grain must be re-landed by the delta merge")
      assert(again.map(_.toString).sorted.toSeq ==
        got.map(_.toString).sorted.toSeq,
        "the reused-artifact run serves the identical report")
    } finally graft.Scratch.rmTree(out.toFile)
  }
}
