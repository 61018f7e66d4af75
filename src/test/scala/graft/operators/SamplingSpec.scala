package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs(n: Int, source: String): DataFrame =
    (0 until n).map(i => (i.toLong + source.hashCode.abs.toLong * 1000, source))
      .toDF("doc_id", "source")
      .selectExpr("doc_id", "'x' AS text", "'en' AS lang", "source",
        "CAST(1 AS BIGINT) AS n_chars")

  test("rate 100 keeps everything, rate 0 keeps nothing, default applies between") {
    val corpus = docs(200, "keep").union(docs(200, "drop")).union(docs(200, "other"))
    val res = Sampling.stratifiedSample(corpus,
        Seq("keep" -> 100, "drop" -> 0), defaultPct = 50)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(res("keep") == 200L)
    assert(!res.contains("drop"))
    // hash coin is uniform-ish: 50% default lands well inside (20%, 80%)
    assert(res("other") > 40L && res("other") < 160L)
  }

  test("leakage-safe split: near-duplicate families never straddle train/test") {
    // 0,1,2 identical and 3,4 identical → two clusters; 5 is a singleton
    val texts = Seq(
      0L -> "the quick brown fox jumps over the lazy dog today",
      1L -> "the quick brown fox jumps over the lazy dog today",
      2L -> "the quick brown fox jumps over the lazy dog today",
      3L -> "completely different words about spark query engines here now",
      4L -> "completely different words about spark query engines here now",
      5L -> "unique text with nothing shared among any other corpus member")
    val corpus = texts.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'t' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
    val res = Sampling.leakageSafeSplit(corpus)
      .select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect()
    assert(res.length == 6, "every document gets a split")
    val byCluster = res.groupBy(_._2).values
    byCluster.foreach { members =>
      assert(members.map(_._3).distinct.length == 1,
        s"cluster ${members.head._2} straddles splits")
    }
    assert(res.groupBy(_._2).size == 3, "two dup families + one singleton")
  }

  test("duplicate stratum keys are rejected (engine last-match vs SQL first-match)") {
    val corpus = docs(10, "s")
    val dup = Seq("web" -> 10, "books" -> 50, "web" -> 90)
    val e = intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(corpus, dup)
    }
    assert(e.getMessage.contains("web"))
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSampleSql(dup)
    }
  }

  test("selection is deterministic: same subset on every invocation") {
    val corpus = docs(300, "s")
    val a = Sampling.stratifiedSample(corpus, Seq(), defaultPct = 30)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.stratifiedSample(corpus, Seq(), defaultPct = 30)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
  }

  private def ordersDf(rows: (Long, String, Double)*): DataFrame =
    rows.toDF("o_orderkey", "o_orderpriority", "o_totalprice")

  test("weightedSample: exactly k per stratum, deterministic across runs") {
    val o = ordersDf((1L to 40L).map(k =>
      (k, if (k % 2 == 0) "HIGH" else "LOW", 100.0 + k)): _*)
    val a = Sampling.weightedSample(o, k = 3)
      .select("stratum", "o_orderkey").as[(String, Long)].collect().sorted.toSeq
    val b = Sampling.weightedSample(o, k = 3)
      .select("stratum", "o_orderkey").as[(String, Long)].collect().sorted.toSeq
    assert(a == b)
    assert(a.count(_._1 == "HIGH") == 3 && a.count(_._1 == "LOW") == 3)
  }

  test("weightedSample: an overwhelming weight forces selection") {
    // one row weighs ~10^9 x the others: its priority u/w is ~0 while the
    // others keep 48-bit-scale priorities — it MUST be in the sample
    val o = ordersDf(((1L to 200L).map(k => (k, "P", 1.0)) :+
      (999L, "P", 2e9)): _*)
    val picked = Sampling.weightedSample(o, k = 1)
      .select("o_orderkey").as[Long].collect()
    assert(picked.toSeq == Seq(999L))
  }

  test("mixtureRates: scarcest-relative-to-share source rates 1.0, others scale") {
    // srcA: 2 docs x 4 tokens = 8; srcB: 1 doc x 4 tokens = 4.
    // weights A:1 B:1 → B is binding (4/1 < 8/1): rate_B = 1.0, rate_A = 0.5
    val d = Seq(
      (1L, "w w w w", "srcA"), (2L, "w w w w", "srcA"), (3L, "w w w w", "srcB"))
      .toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
    val r = Sampling.mixtureRates(d, Seq.empty)
      .select("source", "rate").as[(String, Double)].collect().toMap
    assert(r("srcB") == 1.0 && r("srcA") == 0.5)
    // demand A at 4x B's share: A becomes binding (8/4 = 2 < 4/1), so A
    // rates 1.0 and B downsamples to 2·1/4 = 0.5
    val r2 = Sampling.mixtureRates(d, Seq("srcA" -> 4))
      .select("source", "rate").as[(String, Double)].collect().toMap
    assert(r2("srcA") == 1.0 && r2("srcB") == 0.5)
    // B at 2x A's share: B binds harder (4/2 = 2 < 8/1), A keeps only 1/4
    val r3 = Sampling.mixtureRates(d, Seq("srcB" -> 2))
      .select("source", "rate").as[(String, Double)].collect().toMap
    assert(r3("srcB") == 1.0 && r3("srcA") == 0.25)
  }

  test("corpusMix matches an independent water-filling + coin reference exactly") {
    val docs = graft.sources.TestData.documents(spark, sf)
    // independent reference: per-doc whitespace tokens, binary-search the
    // maximal integer level, then re-decide every doc with the md5 coin
    val rows = docs.select("doc_id", "source", "text")
      .as[(Long, String, String)].collect()
      .map { case (id, src, text) => (id, src, text.split(" ", -1).length.toLong) }
    val perSrc = rows.groupBy(_._2).map { case (s, rs) => s -> rs.map(_._3).sum }
    val total = perSrc.values.sum
    val budget = total * 50 / 100
    def keptAt(lam: Long) = perSrc.values.map(t => math.min(t, lam)).sum
    var (lo, hi) = (0L, perSrc.values.max)
    while (lo < hi) { // max lam with keptAt(lam) <= budget
      val mid = (lo + hi + 1) / 2
      if (keptAt(mid) <= budget) lo = mid else hi = mid - 1
    }
    val level = if (keptAt(perSrc.values.max) <= budget) perSrc.values.max else lo
    assert(keptAt(level) <= budget, "reference level respects the budget")
    assert(level == perSrc.values.max || keptAt(level + 1) > budget,
      "reference level is maximal")
    def coin32(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(8)
      java.lang.Long.parseLong(hex, 16)
    }
    val expected = rows.groupBy(_._2).map { case (s, rs) =>
      val t = perSrc(s)
      val kept = rs.filter { case (id, _, _) =>
        t <= level || coin32(id) * t < level * 4294967296L
      }
      s -> (rs.length.toLong, rs.map(_._3).sum, kept.length.toLong,
        kept.map(_._3).sum, if (t <= level) 1 else 0)
    }
    val got = Sampling.corpusMix(docs)
      .select("source", "n_docs", "total_tokens", "kept_docs", "kept_tokens", "fully_kept")
      .as[(String, Long, Long, Long, Long, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(got == expected)
    // at a 50% budget at least one source must sit above the water level —
    // if every source were fully kept the total would exceed the budget
    assert(got.values.exists(_._5 == 0))
  }

  test("corpusMix: budget 100 keeps every document of every source") {
    val docs = graft.sources.TestData.documents(spark, sf)
    val r = Sampling.corpusMix(docs, budgetPct = 100)
      .select("n_docs", "kept_docs", "fully_kept").as[(Long, Long, Int)].collect()
    assert(r.nonEmpty)
    r.foreach { case (n, k, f) => assert(n == k && f == 1) }
  }

  test("weightedSample: zero/negative prices clamp to weight 1, never crash") {
    val o = ordersDf((1L, "P", 0.0), (2L, "P", -5.0), (3L, "P", 10.0))
    val r = Sampling.weightedSample(o, k = 3)
      .select("o_orderkey").as[Long].collect().sorted
    assert(r.toSeq == Seq(1L, 2L, 3L))
  }

  // local reference for the 48-bit md5 coin (first 12 hex chars of
  // md5(doc_id) as a long), independent of both engines
  private def refCoin(id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.take(6).map("%02x".format(_)).mkString, 16)
  }

  test("shardShuffle: manifest matches an independent local reference exactly") {
    val n = 300
    val corpus = (0 until n).map(i => (i.toLong, "a b c d e"))
      .toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'t' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")
    val got = Sampling.shardShuffle(corpus, shards = 8)
      .select("shard", "n_docs", "n_tokens", "first_coin", "last_coin", "order_checksum")
      .as[(Int, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

    val byShard = (0 until n).map { i =>
      val c = refCoin(i.toLong); ((c % 8).toInt, c, i.toLong)
    }.groupBy(_._1)
    val want = byShard.map { case (s, rows) =>
      val ordered = rows.sortBy(r => (r._2, r._3))
      val checksum = ordered.zipWithIndex
        .map { case ((_, c, _), idx) => ((idx + 1).toLong * (c % 1000003L)) % 2147483647L }
        .sum
      s -> ((s, rows.size.toLong, rows.size.toLong * 5,
        ordered.head._2, ordered.last._2, checksum))
    }
    assert(got == want)
    // every document landed in exactly one shard
    assert(got.values.map(_._2).sum == n.toLong)
  }

  test("shardShuffle checksum is order-sensitive: reversing a shard's order moves it") {
    val n = 300
    val byShard = (0 until n).map { i =>
      val c = refCoin(i.toLong); ((c % 8).toInt, c, i.toLong)
    }.groupBy(_._1).filter(_._2.size > 1)
    assert(byShard.nonEmpty)
    byShard.foreach { case (_, rows) =>
      def sum(o: Seq[(Int, Long, Long)]) = o.zipWithIndex
        .map { case ((_, c, _), idx) => ((idx + 1).toLong * (c % 1000003L)) % 2147483647L }.sum
      val ordered = rows.sortBy(r => (r._2, r._3))
      assert(sum(ordered) != sum(ordered.reverse))
    }
  }

  test("quotaSample: exactly min(quota, group size) rows per source, deterministic") {
    val docs = graft.sources.TestData.documents(spark, sf)
    val sizes = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val picked = Sampling.quotaSample(docs, quota = 7)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(picked.keySet == sizes.keySet)
    picked.foreach { case (src, n) => assert(n == math.min(7L, sizes(src))) }
    // same coins, same picks: a second run selects the identical id set
    val run1 = Sampling.quotaSample(docs, quota = 7).select("doc_id")
      .as[Long].collect().sorted.toSeq
    val run2 = Sampling.quotaSample(docs, quota = 7).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(run1 == run2)
  }

  test("quotaSample quotas nest: the 3-quota picks are a prefix of the 7-quota picks") {
    val docs = graft.sources.TestData.documents(spark, sf)
    val small = Sampling.quotaSample(docs, quota = 3)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    val big = Sampling.quotaSample(docs, quota = 7)
      .filter($"pick_rank" <= 3)
      .select("source", "doc_id").as[(String, Long)].collect().toSet
    assert(small == big)
  }

  test("estimateAudit: N x sample-mean estimator matches the bound it is audited by") {
    // constant values: the sample mean is exact regardless of the realized
    // sample size, so N*(sample mean) must hit the total exactly -- the
    // property the earlier sum*(100/pct) inverse-probability form lacked
    // whenever the hash coin landed n_sample != N*pct/100 (and for any pct
    // not dividing 100, here pct=7).
    val const = (1L to 400L).map(k => (k, 42.0))
      .toDF("o_orderkey", "o_totalprice")
    val c = Sampling.estimateAudit(const, pct = 7).collect().head
    assert(c.getLong(0) == 400L && c.getLong(1) > 0L)
    assert(c.getDouble(2) == 400.0 * 4200.0, "constant data: estimate is exact")
    assert(c.getDouble(4) == 0.0 && c.getBoolean(6))
    // varying values: err/bound wiring
    val orders = (1L to 400L).map(k => (k, (k % 97).toDouble + 10.0))
      .toDF("o_orderkey", "o_totalprice")
    val r = Sampling.estimateAudit(orders, pct = 5).collect().head
    val (nPop, nSample) = (r.getLong(0), r.getLong(1))
    assert(nPop == 400L)
    assert(nSample > 0L && nSample < 400L, s"5% coin must sample strictly between: $nSample")
    assert(r.getDouble(4) == math.abs(r.getDouble(2) - r.getLong(3).toDouble),
      "abs_err must be |est - exact|")
    assert(r.getDouble(5) > 0.0)
    assert(r.getBoolean(6) == (r.getDouble(4) <= r.getDouble(5)))
  }

  test("sourceCap: keeps the k vocab-richest docs per source, doc_id breaks ties") {
    // source a: distinct-token counts 4,3,3,1 on doc_ids 10,11,12,13 —
    // cap 2 keeps q=4 (id 10) and the FIRST q=3 (id 11, the tie-break)
    val corpus = Seq(
      (10L, "w x y z", "a"), (11L, "p q r", "a"), (12L, "s t u", "a"),
      (13L, "m m m m m m m m m", "a"),
      (20L, "only one doc here", "b"))
      .toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
    val res = Sampling.sourceCap(corpus, k = 2).orderBy("source")
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(res.length == 2)
    val Array(a, b) = res
    assert(a == (("a", 4L, 2L, 2L, 7L + 5L, 7L + 5L + 5L + 17L)),
      s"cap=2 keeps ids 10+11 (n_chars 7+5): $a")
    assert(b == (("b", 1L, 1L, 0L, 17L, 17L)),
      "a source under the cap keeps everything, drops nothing")
    // the kept SET is exactly the window formulation's kept set
    val kept = graft.plans.TopK.perKey(
        corpus.selectExpr("source", "doc_id",
          "CAST(size(array_distinct(split(text, ' '))) AS BIGINT) AS q"),
        Seq("source"),
        Seq(graft.plans.TopK.desc("q"), graft.plans.TopK.asc("doc_id")), 2)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(10L, 11L, 20L))
  }

  test("bootstrapCi: constant data collapses the interval onto the exact mean") {
    val const = (1L to 300L).map(k => (k, 42.0)).toDF("o_orderkey", "o_totalprice")
    val r = Sampling.bootstrapCi(const, b = 16).collect().head
    assert(r.getLong(0) == 300L && r.getInt(1) == 16)
    assert(r.getDouble(2) == 4200.0, "exact mean in cents")
    // every Poisson resample of a constant has the same mean (unless empty,
    // which P ~ e^-300 rules out) -> degenerate interval, trivially covered
    assert(r.getDouble(3) == 4200.0 && r.getDouble(4) == 4200.0)
    assert(r.getBoolean(5))
  }

  test("bootstrapCi: hash-Poisson weights average ~1 and the CI brackets sanely") {
    val orders = (1L to 400L).map(k => (k, (k % 97).toDouble + 10.0))
      .toDF("o_orderkey", "o_totalprice")
    val r = Sampling.bootstrapCi(orders, b = 32).collect().head
    val (lo, hi, exact) = (r.getDouble(3), r.getDouble(4), r.getDouble(2))
    assert(lo <= hi, "order statistics must be ordered")
    // 2.5%..97.5% of 32 replica means around a mean-58ish distribution:
    // the interval is tight but nonzero for varying data
    assert(hi - lo > 0.0 && hi - lo < exact, s"sane width: [$lo, $hi]")
    assert(r.getBoolean(5) == (lo <= exact && exact <= hi))
  }

  test("groupEstimateAudit: groups partition the population; each earns its own bound") {
    val orders = (1L to 900L).map { k =>
      val pri = if (k <= 430) "A" else if (k <= 860) "B" else "C"
      (k, (k % 83).toDouble + 5.0, pri)
    }.toDF("o_orderkey", "o_totalprice", "o_orderpriority")
    val rows = Sampling.groupEstimateAudit(orders, pct = 10).orderBy("priority")
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("A", "B", "C"))
    assert(rows.map(_.getLong(1)).sum == 900L, "group populations partition")
    rows.foreach { r =>
      val (est, exact) = (r.getDouble(3), r.getLong(4).toDouble)
      assert(r.getDouble(5) == math.abs(est - exact), "abs_err = |est - exact|")
      assert(r.getDouble(6) > 0.0, "every group carries a positive bound")
      assert(r.getBoolean(7) == (r.getDouble(5) <= r.getDouble(6)))
    }
    // the small group's RELATIVE bound (bound / n_pop) is the widest —
    // fewer sampled rows must mean a weaker certificate, never a
    // silently-inherited population-level one
    val rel = rows.map(r => r.getString(0) -> r.getDouble(6) / r.getLong(1)).toMap
    assert(rel("C") > rel("A") && rel("C") > rel("B"),
      s"small group must report the widest per-row bound: $rel")
  }

  test("targetEncoding: each fold's encoding excludes exactly its own rows") {
    // category 'a': fold 0 (users 0, 2) carries 10.00s, fold 1 (user 1)
    // carries 20.00s → fold 0 must encode to fold 1's mean and vice
    // versa; category 'b' lives only in fold 0 → NULL (no other-fold
    // evidence, never a smuggled global mean)
    val ev = Seq(
      (1L, 0L, "a", 10.00), (2L, 2L, "a", 10.00),
      (3L, 1L, "a", 20.00), (4L, 1L, "a", 20.00),
      (5L, 0L, "b", 7.00))
      .toDF("event_id", "user_id", "event_type", "value")
    val r = Sampling.targetEncoding(ev, k = 2).collect()
      .map(x => (x.getAs[String]("event_type"), x.getAs[Long]("fold")) ->
        (if (x.isNullAt(x.fieldIndex("encoded_cents"))) None
         else Some(x.getAs[Double]("encoded_cents")))).toMap
    assert(r(("a", 0L)) == Some(2000.0),
      s"fold 0 encodes from fold 1's 20.00s only: $r")
    assert(r(("a", 1L)) == Some(1000.0),
      s"fold 1 encodes from fold 0's 10.00s only: $r")
    assert(r(("b", 0L)) == None, s"single-fold category must encode NULL: $r")
  }

  test("purgedCvFolds: brute-force differential and the non-negative purge margin") {
    val dayMs = 86400000L
    // one event per day for 100 days
    val times = (0L until 100L).map(_ * dayMs)
    val ev = times.zipWithIndex
      .map { case (ms, i) => (i.toLong, 1L, "v", ms) }
      .toDF("event_id", "user_id", "event_type", "ms")
      .selectExpr("event_id", "user_id", "event_type",
        "ms * 1000000 AS ts_ns", "CAST(1.0 AS DOUBLE) AS value")
    val k = 5; val h = dayMs; val e = dayMs
    val r = Sampling.purgedCvFolds(ev, k, h, e).collect()
    assert(r.length == k)
    // plain-Scala reimplementation of the same classification
    val tmin = times.min; val tend = times.max + 1
    for (row <- r) {
      val fold = row.getAs[Int]("fold")
      val lo = tmin + (tend - tmin) * fold / k
      val hi = tmin + (tend - tmin) * (fold + 1) / k
      assert(row.getAs[Long]("lo_ms") == lo && row.getAs[Long]("hi_ms") == hi)
      def roleOf(t: Long): String =
        if (t >= lo && t < hi) "test"
        else if (t < lo && t + h > lo) "purged"
        else if (t >= hi && t < hi + e) "embargo"
        else "train"
      val expect = times.groupBy(roleOf).view.mapValues(_.size.toLong).toMap
      assert(row.getAs[Long]("n_test") == expect.getOrElse("test", 0L), s"fold $fold test")
      assert(row.getAs[Long]("n_train") == expect.getOrElse("train", 0L), s"fold $fold train")
      assert(row.getAs[Long]("n_purged") == expect.getOrElse("purged", 0L), s"fold $fold purged")
      assert(row.getAs[Long]("n_embargo") == expect.getOrElse("embargo", 0L), s"fold $fold embargo")
      // roles partition the population
      assert(row.getAs[Long]("n_test") + row.getAs[Long]("n_train")
        + row.getAs[Long]("n_purged") + row.getAs[Long]("n_embargo") == 100L)
      // the measured safety margin: every pre-test train label ends
      // strictly before the test block starts (fold 0 has no pre-test
      // train and reports NULL)
      if (fold == 0) assert(row.isNullAt(row.fieldIndex("min_gap_ms")))
      else assert(row.getAs[Long]("min_gap_ms") >= 0L, s"fold $fold leaks")
    }
  }

  test("q277: closed-form positions equal the sequential EDF interleave") {
    import spark.implicits._
    // weights derive from name rank: a→1, b→2, c→3, d→1
    val sizes = Map("a" -> 3, "b" -> 5, "c" -> 4, "d" -> 2)
    val weights = Map("a" -> 1L, "b" -> 2L, "c" -> 3L, "d" -> 1L)
    val docs = sizes.toSeq.sortBy(_._1).flatMap { case (s, n) =>
      (1 to n).map(i => ((s.head - 'a') * 100L + i, "x", "en", s, 1L)) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // sequential reference: sort items by deadline (2r−1)/(2w), cross-
    // multiplied exactly, ties by source name then r
    val items = sizes.toSeq.flatMap { case (s, n) =>
      (1 to n).map(r => (s, r.toLong)) }
    val ordered = items.sortWith { case ((s1, r1), (s2, r2)) =>
      val l = (2 * r1 - 1) * weights(s2); val rr = (2 * r2 - 1) * weights(s1)
      if (l != rr) l < rr else if (s1 != s2) s1 < s2 else r1 < r2 }
    val posOf = ordered.zipWithIndex.map { case (it, i) => it -> (i + 1L) }.toMap
    val wAll = weights.values.sum
    val got = Sampling.interleaveSchedule(docs).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    for ((s, n) <- sizes) {
      val ps = (1 to n).map(r => posOf((s, r.toLong)))
      val dev = (1 to n).map(r =>
        math.abs(r * wAll - posOf((s, r.toLong)) * weights(s))).max
      assert(got(s) == ((weights(s), ps.head, ps.sum, dev)),
        s"source $s: got ${got(s)}, want (${weights(s)}, ${ps.head}, ${ps.sum}, $dev)")
    }
    // permutation: N distinct positions starting at 1, deviation-free total
    val n = sizes.values.sum.toLong
    assert(got("__total__") == ((wAll, 1L, n * (n + 1) / 2, 0L)),
      got("__total__"))
  }

  test("q325: doc-hash split leaks exactly the predicted pairs; cluster-safe leaks zero") {
    import spark.implicits._
    // 16 exact-dup pairs (i, i+1000): identical text => same minhash
    // signature => same cluster, label = the smaller id. Ids 11/12/13
    // are known leaky pairs under the md5 coin (e.g. coin(11)=94 vs
    // coin(1011)=25 — test vs train), so doc-hash leakage is guaranteed
    val pairIds = (1L to 16L).map(i => (i, i + 1000L))
    val docs = (pairIds.flatMap { case (a, b) =>
      val text = (0 until 20).map(t => s"w${a}_$t").mkString(" ")
      Seq((a, text), (b, text))
    } :+ ((500L, (0 until 20).map(t => s"solo_$t").mkString(" "))))
      .toDF("doc_id", "text") // plus one singleton: its own cluster
    // the operator's exact md5 coin, recomputed independently
    def coinOf(id: Long): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 12), 16) % 100
    }
    def splitOf(c: Long): String =
      if (c < 80) "train" else if (c < 90) "val" else "test"
    val expLeaky = pairIds.count { case (a, b) =>
      splitOf(coinOf(a)) != splitOf(coinOf(b))
    }
    val expTrainSafe =
      2L * pairIds.count { case (a, _) => splitOf(coinOf(a)) == "train" } +
        (if (splitOf(coinOf(500L)) == "train") 1L else 0L)
    val got = Sampling.clusterSafeSplit(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val (a, b) = (got("a_doc_hash"), got("b_cluster_safe"))
    assert(a.getLong(4) == 17L && b.getLong(4) == 17L, "16 pairs + 1 singleton")
    assert(a.getLong(5) == expLeaky.toLong,
      s"doc-hash leakage is exactly the coin prediction: $a vs $expLeaky")
    assert(expLeaky > 0, "the corpus must exhibit leakage under doc-hash")
    assert(b.getLong(5) == 0L, "cluster-safe leakage is structurally zero")
    // every doc lands somewhere, in both schemes
    Seq(a, b).foreach(r =>
      assert(r.getLong(1) + r.getLong(2) + r.getLong(3) == 33L, s"$r"))
    // the safe scheme's train count follows the CLUSTER coins
    assert(b.getLong(1) == expTrainSafe, s"$b vs $expTrainSafe")
  }
}
