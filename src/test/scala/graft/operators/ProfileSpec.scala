package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Histogram bucket arithmetic edges and profiler null/distinct counting —
  * the cases the corpus-level oracle rows can't isolate.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("histogram: exact bucket edges, max value lands in the last bucket") {
    // values 0..99, k=10: bucket(v) = v*10 div 100 = v div 10 exactly
    val df = spark.range(0, 100).toDF("x")
    val h = Profile.histogram(df, col("x"), k = 10)
      .orderBy("bucket").collect()
    assert(h.length === 10)
    h.zipWithIndex.foreach { case (r, i) =>
      assert(r.getInt(0) === i)
      assert(r.getLong(1) === 10L) // 10 values per bucket
      assert(r.getLong(2) === i * 10L) // lo
      assert(r.getLong(3) === i * 10L + 9L) // hi
    }
  }

  test("histogram: constant column degenerates to one full bucket 0") {
    val df = Seq(7L, 7L, 7L).toDF("x")
    val h = Profile.histogram(df, col("x"), k = 5).collect()
    assert(h.map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      === Seq((0, 3L, 7L, 7L)))
  }

  test("profiler counts nulls and distincts per column in one pass") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), None), (None, Some("b")), (Some(2L), Some("a"))
    ).toDF("num", "str")
    val p = Profile.columns(df,
      Seq(Profile.ColSpec.plain("num"), Profile.ColSpec.plain("str")))
      .orderBy("col_name").collect()
    val byName = p.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    assert(byName("num") == ((1L, 2L, "1", "2")))
    assert(byName("str") == ((1L, 2L, "a", "b")))
  }

  // (event_id, event_type, value); user/ts irrelevant to robustSpread
  private def evV(rows: (Long, String, Double)*) =
    rows.toDF("event_id", "event_type", "value")

  test("robustSpread: median and MAD resist a wild outlier") {
    // type A: [1,2,3,4,100] -> median 3; devs [2,1,0,1,97] -> MAD 1
    val e = evV((1L, "A", 1.0), (2L, "A", 2.0), (3L, "A", 3.0),
      (4L, "A", 4.0), (5L, "A", 100.0))
    val r = Profile.robustSpread(e)
      .select("event_type", "median", "mad")
      .as[(String, Double, Double)].collect().toSeq
    assert(r == Seq(("A", 3.0, 1.0)))
  }

  test("robustSpread: even counts take the midpoint of both middles") {
    // type B: [1,2] -> median 1.5; devs [0.5, 0.5] -> MAD 0.5
    val e = evV((1L, "B", 1.0), (2L, "B", 2.0))
    val r = Profile.robustSpread(e)
      .select("event_type", "median", "mad")
      .as[(String, Double, Double)].collect().toSeq
    assert(r == Seq(("B", 1.5, 0.5)))
  }

  test("quantileSuite: percentile_disc picks exact elements at ceil(p*n/100)") {
    val big = (1 to 100).map(i => (i.toLong, "A", i.toDouble))
    val small = Seq((101L, "B", 10.0), (102L, "B", 20.0), (103L, "B", 30.0))
    val e = evV((big ++ small): _*)
    val r = Profile.quantileSuite(e).orderBy("event_type")
      .as[(String, Double, Double, Double, Double, Double)].collect().toSeq
    assert(r == Seq(
      ("A", 25.0, 50.0, 75.0, 90.0, 99.0),
      // n=3: positions ceil(.75)=1, ceil(1.5)=2, ceil(2.25)=3, 3, 3
      ("B", 10.0, 20.0, 30.0, 30.0, 30.0)))
  }

  test("quantileSuite rejects out-of-range or duplicate percentiles") {
    val e = evV((1L, "A", 1.0))
    intercept[IllegalArgumentException](Profile.quantileSuite(e, Seq(0)))
    intercept[IllegalArgumentException](Profile.quantileSuite(e, Seq(50, 50)))
  }

  test("ksDrift: complete separation gives D=1, identical halves give D=0") {
    val day = 86400000L
    // days 0..7, midpoint 3: days 0-3 early, 4-7 late.
    // type x: early values 1..4, late values 5..8 — disjoint supports,
    // D must be exactly 1 and the α=0.05 gate fires (crit ≈ 0.96).
    // type y: the same values {1,2,3,4} in both halves — D exactly 0.
    val rows =
      (0L until 4L).map(i => (i + 1, 1L, "x", i * day, (i + 1).toDouble)) ++
      (0L until 4L).map(i => (i + 10, 1L, "x", (i + 4) * day, (i + 5).toDouble)) ++
      (0L until 4L).map(i => (i + 20, 1L, "y", i * day, (i + 1).toDouble)) ++
      (0L until 4L).map(i => (i + 30, 1L, "y", (i + 4) * day, (i + 1).toDouble))
    val e = rows.toDF("event_id", "user_id", "event_type", "ms", "value")
      .selectExpr("event_id", "user_id", "event_type",
        "ms * 1000000 AS ts_ns", "value")
    val r = Profile.ksDrift(e).collect()
      .map(x => x.getAs[String]("event_type") -> x).toMap
    assert(r("x").getAs[Long]("na") == 4L && r("x").getAs[Long]("nb") == 4L)
    assert(r("x").getAs[Double]("d_stat") == 1.0)
    assert(r("x").getAs[Int]("drifted") == 1)
    assert(r("y").getAs[Double]("d_stat") == 0.0)
    assert(r("y").getAs[Int]("drifted") == 0)
  }

  test("q286: the lower bound demotes tiny samples that raw rate over-ranks") {
    import spark.implicits._
    // part 1: 2/2 returned (raw 1.0); part 2: 28/30 (raw 0.933);
    // part 3: 1/100 — Wilson must put part 2 FIRST despite raw saying 1
    val rows = (1 to 2).map(i => (1L, "R")) ++
      (1 to 28).map(_ => (2L, "R")) ++ (1 to 2).map(_ => (2L, "N")) ++
      Seq((3L, "R")) ++ (1 to 99).map(_ => (3L, "N"))
    val li = rows.toDF("l_partkey", "l_returnflag")
    val got = Profile.wilsonReturnRanking(li, k = 3).collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(2L, 1L, 3L),
      s"wilson order wrong: ${got.map(_.getLong(0)).toSeq}")
    val byPart = got.map(r => r.getLong(0) ->
      ((r.getDouble(3), r.getDouble(4)))).toMap
    // raw rate still says part 1 wins — the re-ranking is the point
    assert(byPart(1L)._1 == 1.0 && byPart(2L)._1 < 1.0)
    assert(byPart(2L)._2 > byPart(1L)._2)
    // independent scalar reference for the n=2, k=2 bound
    val (n, kk, z) = (2.0, 2.0, 1.96)
    val p = kk / n
    val ref = (p + z * z / (2 * n) -
      z * math.sqrt((p * (1 - p) + z * z / (4 * n)) / n)) / (1 + z * z / n)
    assert(math.abs(byPart(1L)._2 - ref) < 1e-12)
  }

  test("q311: Spearman hits the exact poles, NULLs zero variance, and matches a BigInt reference under ties") {
    import spark.implicits._
    // A: y monotone in x -> rho exactly 1; B: reversed -> exactly -1;
    // C: constant x -> NULL; D: ties on both sides -> tie-corrected value
    val cust = Seq(
      (1L, "A", 1.0), (2L, "A", 2.0), (3L, "A", 3.0), (4L, "A", 4.0),
      (5L, "B", 1.0), (6L, "B", 2.0), (7L, "B", 3.0), (8L, "B", 4.0),
      (9L, "C", 5.0), (10L, "C", 5.0), (11L, "C", 5.0),
      (12L, "D", 1.0), (13L, "D", 1.0), (14L, "D", 2.0), (15L, "D", 3.0))
      .toDF("c_custkey", "c_mktsegment", "c_acctbal")
    val ords = Seq(
      (1L, 10.0), (2L, 20.0), (3L, 30.0), (4L, 40.0),
      (5L, 40.0), (6L, 30.0), (7L, 20.0), (8L, 10.0),
      (9L, 10.0), (10L, 20.0), (11L, 30.0),
      // D: custkeys 12/13 tie on x AND both have no orders (y = 0 tie)
      (14L, 10.0), (15L, 20.0))
      .toDF("o_custkey", "o_totalprice")
    val got = Profile.spearmanBySegment(cust, ords).collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    // the poles land within one ulp of ±1: num equals the variance v
    // exactly, but the overflow-safe denominator is sqrt(v)·sqrt(v),
    // which differs from v by a rounding when v isn't a perfect square
    // (the same deliberate trade as q301's four-sqrt MCC denominator —
    // exact per-factor casts below 2^53 beat an exact pole)
    assert(got("A").exists(r => math.abs(r - 1.0) < 1e-14), s"monotone: $got")
    assert(got("B").exists(r => math.abs(r + 1.0) < 1e-14), s"reversed: $got")
    assert(got("C").isEmpty, "zero x-variance must be NULL")
    // BigInt reference for D with average ranks, same operation order:
    // x = (1,1,2,3) -> 2r = (3,3,6,8); y = (0,0,10,20) -> 2r = (3,3,6,8)
    val rx = Seq(3L, 3L, 6L, 8L).map(BigInt(_))
    val n = BigInt(4)
    val num = n * rx.zip(rx).map { case (a, b) => a * b }.sum -
      rx.sum * rx.sum
    val v = n * rx.map(r => r * r).sum - rx.sum * rx.sum
    val ref = num.toDouble /
      (math.sqrt(v.toDouble) * math.sqrt(v.toDouble))
    assert(got("D").contains(ref),
      s"tie-corrected value must match the BigInt reference exactly: " +
        s"$got vs $ref")
    assert(got("D").exists(r => math.abs(r - 1.0) < 1e-14),
      "identical tie patterns correlate at the +1 pole")
  }

  test("q311: testdata segments stay in [-1, 1] with full-count rows") {
    val got = Profile.spearmanBySegment(
      graft.sources.TestData.customer(spark, sf),
      graft.sources.TestData.orders(spark, sf)).collect()
    assert(got.length >= 2, "sf0.001 must have several segments")
    val nTotal = got.map(_.getLong(1)).sum
    assert(nTotal == graft.sources.TestData.customer(spark, sf).count(),
      "every customer must carry a rank pair")
    got.foreach { r =>
      assert(!r.isNullAt(2), "real segments have variance on both sides")
      val rho = r.getDouble(2)
      assert(rho >= -1.0 && rho <= 1.0, s"rho out of range: $rho")
    }
  }

  test("q313: exact independence scores zero; a diagonal 2x2 scores chi2 = 20 exactly") {
    import spark.implicits._
    def ev(tp: String, day: Long, n: Int) =
      (1 to n).map(_ => (tp, day * 86400000L * 1000000L))
    // independent: per-type dow mix identical (1:2) -> every cell d = 0
    val indep = (ev("a", 0, 10) ++ ev("a", 1, 20) ++
      ev("b", 0, 30) ++ ev("b", 1, 60))
      .toDF("event_type", "ts_ns")
    val gi = Profile.chiSquareDrift(indep).collect()
    assert(gi.length == 4)
    gi.foreach { r =>
      assert(r.getLong(4) == 0L, s"independent cell must contribute 0: $r")
      assert(r.getLong(5) == 0L, "table chi2 must be 0")
      assert(r.getLong(6) == 1L, "df = (2-1)(2-1)")
    }
    // exp_e6 sanity on one cell: E(a, dow0) = 30*40/120 = 10
    val a0 = gi.find(r => r.getString(0) == "a" && r.getLong(1) == 0L).get
    assert(a0.getLong(2) == 10L && a0.getLong(3) == 10000000L)
    // perfectly dependent diagonal: chi2 = n = 20 exactly — each of the
    // four cells (TWO of them never observed) contributes (O-E)^2/E = 5;
    // dropping the zero cells would halve the statistic (the densify
    // contract this test pins)
    val diag = (ev("a", 0, 10) ++ ev("b", 1, 10)).toDF("event_type", "ts_ns")
    val gd = Profile.chiSquareDrift(diag).collect()
    assert(gd.length == 4, "the dense grid must include zero-observed cells")
    assert(gd.count(_.getLong(2) == 0L) == 2, "two cells observe nothing")
    gd.foreach { r =>
      assert(r.getLong(3) == 5000000L, s"every cell expects 5: $r")
      assert(r.getLong(4) == 5000000L, s"every cell contributes 5: $r")
      assert(r.getLong(5) == 20000000L, "table chi2 must be exactly n = 20")
      assert(r.getLong(6) == 1L)
    }
  }

  test("q313: testdata total equals the sum of its cells and df matches the grid") {
    val got = Profile.chiSquareDrift(
      graft.sources.TestData.events(spark, sf)).collect()
    val types = got.map(_.getString(0)).distinct.length
    val dows = got.map(_.getLong(1)).distinct.length
    val total = got.map(_.getLong(5)).distinct
    assert(total.length == 1, "one table statistic on every row")
    assert(total.head == got.map(_.getLong(4)).sum,
      "chi2_e6 must be the exact integer sum of cell contributions")
    assert(got.forall(_.getLong(6) == (types - 1).toLong * (dows - 1)),
      "df must match the observed grid")
    got.foreach(r => assert(r.getLong(4) >= 0L && r.getLong(3) > 0L))
  }

  test("q313: pre-1970 timestamps land on positive 0..6 weekday labels") {
    import spark.implicits._
    def ev(tp: String, day: Long, n: Int) =
      (1 to n).map(_ => (tp, day * 86400000L * 1000000L))
    // day -1 = 1969-12-31 (Wednesday): pmod(-1, 7) = 6, never -1; and a
    // sub-ms offset below the day boundary must FLOOR into day -1, not
    // truncate up into day 0 (Thursday)
    val rows = (ev("a", -1, 3) ++ ev("a", 0, 5) ++
      Seq(("a", -500000L))) // -0.5 ms: floors to ms -1 -> day -1 -> dow 6
      .toDF("event_type", "ts_ns")
    val dows = Profile.chiSquareDrift(rows).collect()
      .filter(_.getLong(2) > 0L).map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(dows == Map(6L -> 4L, 0L -> 5L),
      s"Wed(-1day)+the floored sub-ms row on dow 6, Thu(epoch) on dow 0: $dows")
  }
}
