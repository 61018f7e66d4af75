package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PII detection/redaction: counts on the original text, ordered
  * replace-all redaction, zero-hit passthrough.
  */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def run(txt: String) =
    Privacy.detectRedact(Seq((1L, txt)).toDF("id", "txt"), "txt", Seq("id"))
      .collect().head

  test("counts and redacts every rule, all occurrences") {
    val r = run("mail a.b@x.io or c_d%e@y.co call 12-345-678-9012 from 10.0.0.1 end")
    assert(r.getAs[Long]("n_email") == 2)
    assert(r.getAs[Long]("n_phone") == 1)
    assert(r.getAs[Long]("n_ip") == 1)
    assert(r.getAs[String]("redacted") ==
      "mail <EMAIL> or <EMAIL> call <PHONE> from <IP> end")
  }

  test("clean text passes through untouched with zero counts") {
    val r = run("no contact details here, just words and 1234 numbers")
    assert(r.getAs[Long]("n_email") == 0)
    assert(r.getAs[Long]("n_phone") == 0)
    assert(r.getAs[Long]("n_ip") == 0)
    assert(r.getAs[String]("redacted") ==
      "no contact details here, just words and 1234 numbers")
  }

  test("repeated hits of one rule are all counted and all redacted") {
    val r = run("1.2.3.4 then 5.6.7.8 then 9.10.11.12")
    assert(r.getAs[Long]("n_ip") == 3)
    assert(r.getAs[String]("redacted") == "<IP> then <IP> then <IP>")
  }

  test("id columns are carried through unchanged") {
    val df = Seq((7L, "grp", "x@y.io")).toDF("id", "g", "txt")
    val r = Privacy.detectRedact(df, "txt", Seq("id", "g")).collect().head
    assert(r.getAs[Long]("id") == 7L && r.getAs[String]("g") == "grp")
    assert(r.getAs[String]("redacted") == "<EMAIL>")
  }

  // --- k-anonymity / l-diversity lattice -----------------------------

  private def cust(rows: (Long, String, Double)*) =
    rows.toDF("c_nationkey", "c_mktsegment", "c_acctbal")

  test("k-anonymity: rows_at_risk non-increasing up the lattice, first " +
      "satisfying level minimal") {
    // nation 1 / AUTO: 5 rows in one band (k=5 safe at level 0 already);
    // nation 2: 2 AUTO + 2 HOME rows, each sub-k at levels 0-1, merged
    // safe only at level 2 (nation grain: 4 rows still < 5 → only level 3)
    val df = cust(
      (Seq.fill(5)((1L, "AUTO", 100.0)) ++
        Seq((2L, "AUTO", 100.0), (2L, "AUTO", 100.0),
          (2L, "HOME", 2100.0), (2L, "HOME", 2100.0))): _*)
    val r = Privacy.kAnonymityAudit(df, k = 5).collect()
    assert(r.map(_.getAs[Int]("level")).toSeq == Seq(0, 1, 2, 3))
    val risk = r.map(_.getAs[Long]("rows_at_risk")).toSeq
    assert(risk == Seq(4L, 4L, 4L, 0L))
    assert(risk.zip(risk.tail).forall { case (a, b) => a >= b },
      "coarsening must never increase the at-risk population")
    val sat = r.map(_.getAs[Boolean]("satisfies_k")).toSeq
    assert(sat == Seq(false, false, false, true))
    assert(r(3).getAs[Long]("min_group_size") == 9L)
  }

  test("k-anonymity: negative balances band with floor semantics") {
    // quant(x,100)/100000 floors: -0.01 -> cents -1 -> band -1, not 0;
    // 0.0 and 999.99 share band 0; 1000.00 opens band 1
    val df = cust((1L, "AUTO", -0.01), (1L, "AUTO", 0.0),
      (1L, "AUTO", 999.99), (1L, "AUTO", 1000.0))
    val l0 = Privacy.kAnonymityAudit(df, k = 1).collect()(0)
    assert(l0.getAs[Long]("n_groups") == 3L,
      "bands must split as {-1}, {0}, {1}")
    // k=1 is always satisfied (every non-empty group has >= 1 row)
    assert(l0.getAs[Boolean]("satisfies_k"))
    assert(l0.getAs[Long]("rows_at_risk") == 0L)
  }

  test("k-anonymity rejects k < 1") {
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityAudit(cust((1L, "AUTO", 1.0)), k = 0)
    }
  }

  test("l-diversity: level 0 is trivially 1-diverse; merging from level 0 " +
      "only grows diversity") {
    // nation 1 spans 3 bands, nation 2 is homogeneous (1 band)
    val df = cust(
      (1L, "AUTO", 100.0), (1L, "AUTO", 1100.0), (1L, "HOME", 2100.0),
      (2L, "AUTO", 100.0), (2L, "AUTO", 100.0))
    val r = Privacy.lDiversityAudit(df, l = 2).collect()
    // level 0: band is part of the QI, so every group has exactly 1 value
    assert(r(0).getAs[Long]("min_diversity") == 1L)
    assert(!r(0).getAs[Boolean]("satisfies_l"))
    assert(r(0).getAs[Long]("rows_at_risk") == 5L)
    // level-0 groups are single-band, so diversity is monotone from there
    val mins = r.map(_.getAs[Long]("min_diversity"))
    assert(mins(1) >= mins(0) && mins(3) >= mins(2))
    // nation 2 stays homogeneous through level 2 (its only band is 0)
    assert(r(2).getAs[Long]("min_diversity") == 1L)
    assert(r(2).getAs[Long]("rows_at_risk") == 2L)
    // level 3: one global group spanning bands {0, 1, 2} -> 3-diverse
    assert(r(3).getAs[Long]("min_diversity") == 3L)
    assert(r(3).getAs[Boolean]("satisfies_l"))
    assert(r(3).getAs[Long]("rows_at_risk") == 0L)
  }

  test("anonymizeToK: releases at the MINIMAL satisfying level and every " +
      "group clears k") {
    // level 0 fails (singleton bands), level 1 (nation,segment) is the
    // first level where every group reaches k=2
    val df = cust(
      (1L, "AUTO", 100.0), (1L, "AUTO", 1100.0),
      (2L, "HOME", 100.0), (2L, "HOME", 2100.0))
    val r = Privacy.anonymizeToK(df, k = 2).collect()
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Int]("level") == 1), "level 1 is minimal here")
    assert(r.forall(_.getAs[String]("band_g") == "*"), "band suppressed at level 1")
    assert(r.forall(_.getAs[Long]("n") >= 2L), "every released group clears k")
    assert(r.map(_.getAs[Long]("n")).sum == 4L, "the release partitions all rows")
  }

  test("anonymizeToK: k=1 releases at level 0 (identity grain); fewer than " +
      "k rows total releases NOTHING") {
    val df = cust((1L, "AUTO", 100.0), (2L, "HOME", 2100.0))
    val id = Privacy.anonymizeToK(df, k = 1).collect()
    assert(id.forall(_.getAs[Int]("level") == 0))
    assert(id.length == 2 && id.forall(_.getAs[String]("band_g") != "*"))
    // 2 rows < k=3 even fully merged: the only safe release is none
    val none = Privacy.anonymizeToK(df, k = 3)
    assert(none.count() == 0L,
      "sub-k populations must release zero rows, not an unsafe group")
  }

  test("t-closeness: hand-checked EMD for point-mass groups; the merged " +
      "level is exactly the global distribution") {
    // two bands, 50/50 globally; each nation is a point mass on one band
    // -> ordered EMD = 0.5 per nation group at level 2
    val df = cust((Seq.fill(4)((1L, "AUTO", 100.0)) ++
      Seq.fill(4)((2L, "AUTO", 1100.0))): _*)
    val r = Privacy.tClosenessAudit(df, tNum = 1, tDen = 4).collect()
    assert(r.map(_.getAs[Int]("level")).toSeq == Seq(0, 1, 2, 3))
    // level 2 (nation): both groups at EMD 0.5 > 1/4 -> all 8 rows at risk
    assert(r(2).getAs[Double]("max_emd") == 0.5)
    assert(r(2).getAs[Long]("rows_at_risk") == 8L)
    assert(!r(2).getAs[Boolean]("satisfies_t"))
    // level 3: the single merged group IS the global distribution
    assert(r(3).getAs[Double]("max_emd") == 0.0)
    assert(r(3).getAs[Long]("rows_at_risk") == 0L)
    assert(r(3).getAs[Boolean]("satisfies_t"))
  }

  test("t-closeness: a single global band is 0-distant everywhere (m=1 " +
      "degenerate); a tolerant t accepts skew") {
    val mono = cust(Seq.fill(6)((1L, "AUTO", 500.0)) :+ ((2L, "HOME", 700.0)): _*)
    val r = Privacy.tClosenessAudit(mono).collect()
    r.foreach { x =>
      assert(x.getAs[Double]("max_emd") == 0.0)
      assert(x.getAs[Boolean]("satisfies_t"))
    }
    // 3:1 band skew between two nations: EMD = |3/4 - 1/2| ... hand value:
    // nation 1 all band 0, nation 2 all band 1, global 3/4 vs 1/4
    // -> EMD(n1) = 1/4, EMD(n2) = 3/4; t = 1/2 accepts n1, rejects n2
    val skew = cust((Seq.fill(3)((1L, "AUTO", 100.0)) :+ ((2L, "AUTO", 1100.0))): _*)
    val half = Privacy.tClosenessAudit(skew, tNum = 1, tDen = 2).collect()
    assert(half(2).getAs[Double]("max_emd") == 0.75)
    assert(half(2).getAs[Long]("rows_at_risk") == 1L,
      "only nation 2's single row exceeds t = 1/2")
  }

  test("l-diversity: a k-safe group can still fail diversity") {
    // one big homogeneous group: k=5 satisfied at every level, yet
    // 1-diverse everywhere — the homogeneity attack k-anonymity misses
    val df = cust(Seq.fill(8)((3L, "AUTO", 500.0)): _*)
    val k = Privacy.kAnonymityAudit(df, k = 5).collect()
    assert(k.forall(_.getAs[Boolean]("satisfies_k")))
    val l = Privacy.lDiversityAudit(df, l = 2).collect()
    assert(l.forall(!_.getAs[Boolean]("satisfies_l")))
    assert(l.forall(_.getAs[Long]("rows_at_risk") == 8L))
  }

  test("q274: releases reconcile exactly with the noise table and the budget sums") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, expr}
    val events = (1L to 40L).map(i =>
      (i, i % 7, if (i % 2 == 0) "click" else "view", i * 3600000L))
      .toDF("event_id", "user_id", "event_type", "ms")
      .selectExpr("event_id", "user_id", "event_type",
        "ms * 1000000 AS ts_ns", "CAST(1.0 AS DOUBLE) AS value")
    val rows = Privacy.dpHistogramRelease(events).collect()
    val rel = rows.filter(_.getString(0) != "budget")
    assert(rel.nonEmpty)
    rel.foreach { r =>
      val (n, noise, released) = (r.getAs[Long]("true_n"),
        r.getAs[Long]("noise_fp"), r.getAs[Double]("released"))
      // released is EXACTLY count + table-noise (post-processing only)
      assert(released == (n * 1000000L + noise).toDouble / 1000000.0, s"$r")
      // truncated-Laplace scale 2: |noise| <= 2·ln(256) + slack
      assert(math.abs(noise) <= 12000000L, s"noise out of range: $r")
      assert(r.getAs[Long]("eps_num") == 1L && r.getAs[Long]("eps_den") == 2L)
    }
    // determinism: the same key draws the same noise on a re-run
    val again = Privacy.dpHistogramRelease(events).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
    // budget: two eps=1/2 releases compose to the recorded total of 1
    val b = rows.filter(_.getString(0) == "budget")
    assert(b.length == 1 && b.head.getAs[Long]("eps_num") == 1L
      && b.head.getAs[Long]("eps_den") == 1L)
  }
}
