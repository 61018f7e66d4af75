package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'s' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")

  test("vocabCoverage: OOV against the top-V vocab; boundary ties by token asc") {
    // counts: a=3, b=2, c=1 -> V=2 vocab {a,b}; doc1 has one oov token (c)
    val d = docs((1L, "a a b c"), (2L, "a b"))
    val r = TextAnalysis.vocabCoverage(d, vocabSize = 2).orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(r == Seq((1L, 4L, 1L, 0.25), (2L, 2L, 0L, 0.0)))
    // V=1 with a tie at the cut: x and y both count 1 -> 'x' wins (asc)
    val tied = docs((1L, "x y"))
    val r1 = TextAnalysis.vocabCoverage(tied, vocabSize = 1)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(r1 == Seq((1L, 2L, 1L, 0.5)))
  }

  test("knContinuation counts distinct contexts, not occurrences") {
    // bigram TYPES: (a,b) (b,c) (a,b) dedups; (b,d); (b,b)
    val d = docs((1L, "a b c"), (2L, "a b d"), (3L, "b b"))
    val r = TextAnalysis.knContinuation(d)
      .as[(String, Long, Long, Long)].collect().toSeq
    // (word, unigram cnt, continuations N1+(.w), fertility N1+(w.))
    assert(r == Seq(
      ("b", 4L, 2L, 3L), // contexts {a,b}; opens {b,c,d}
      ("c", 1L, 1L, 0L), ("d", 1L, 1L, 0L), ("a", 2L, 0L, 1L)))
  }

  test("classifierMargin matches an independent md5 weight computation") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def weight(t: String): Long = {
      val idx = java.lang.Long.parseLong(md5hex(t).substring(0, 12), 16) % 1024L
      (idx * 2654435761L) % 1001L - 500L
    }
    val d = docs((1L, "alpha"), (2L, "alpha beta gamma"))
    val r = TextAnalysis.classifierMargin(d).orderBy("doc_id")
      .as[(Long, Long, Long, Int)].collect().toSeq
    val w1 = weight("alpha")
    val w2 = weight("alpha") + weight("beta") + weight("gamma")
    assert(r == Seq(
      (1L, 1L, w1, if (w1 > 0) 1 else 0),
      (2L, 3L, w2, if (w2 > 0) 1 else 0)))
  }

  test("classifierMargin margins are bounded by 500 per token") {
    val d = TextAnalysis.classifierMargin(
      graft.sources.TestData.documents(spark, sf))
    val bad = d.filter(abs(col("margin")) > col("n_tokens") * 500).count()
    assert(bad == 0)
  }

  test("bpePairs counts adjacent pairs inside alpha runs only") {
    // "abab" -> ab, ba, ab ; "ab!cd" -> runs "ab","cd" -> ab, cd
    // (no pair across the punctuation boundary)
    val d = docs((1L, "abab"), (2L, "ab!cd"))
    val r = TextAnalysis.bpePairs(d, k = 10)
      .as[(String, Long)].collect().toMap
    assert(r == Map("ab" -> 3L, "ba" -> 1L, "cd" -> 1L))
  }

  test("bpePairs: single-char runs contribute nothing; ties break by pair asc") {
    val d = docs((1L, "a b c xy"), (2L, "zz"))
    val top = TextAnalysis.bpePairs(d, k = 1)
      .as[(String, Long)].collect()
    // xy and zz both freq 1 → 'xy' < 'zz' wins the k=1 cut
    assert(top.toSeq == Seq(("xy", 1L)))
  }

  test("collocations rank an always-together pair above an independent one") {
    // "new york" always adjacent (lift = N/(cnt_a*cnt_b) high); "the cat"
    // also co-occurs but 'the' appears everywhere → low lift
    val d = docs(
      (1L, "new york the cat the dog the fish"),
      (2L, "new york the cat the bird the cow"),
      (3L, "new york the dog the cow the fish"),
      (4L, "new york the bird the fish the cow"),
      (5L, "new york the cow the cat the dog"))
    val r = TextAnalysis.collocations(d, k = 5, minPair = 5)
      .select("a", "b").as[(String, String)].collect()
    assert(r.head == ("new", "york"))
  }

  test("collocations: pairs below minPair support are cut") {
    val d = docs((1L, "a b a b a b"), (2L, "c d"))
    val r = TextAnalysis.collocations(d, k = 10, minPair = 3)
      .select("a", "b").as[(String, String)].collect().toSet
    assert(!r.contains(("c", "d")))
    // "a b" appears 3x in doc 1 (positions 0-1, 2-3, 4-5)
    assert(r.contains(("a", "b")))
  }

  test("sourceDiversity: boilerplate source scores far below a varied one") {
    val rows = (1 to 10).map(i => (i.toLong, "same old template text here", "mill")) ++
      (11 to 20).map(i => (i.toLong, s"unique words number $i in this document", "varied"))
    val d = rows.toDF("doc_id", "text", "source")
      .selectExpr("doc_id", "text", "'en' AS lang", "source",
        "CAST(length(text) AS BIGINT) AS n_chars")
    val r = TextAnalysis.sourceDiversity(d)
      .select("source", "diversity").as[(String, Double)].collect().toMap
    // mill: 10 docs share the same 3 trigrams → 3/30 = 0.1
    assert(math.abs(r("mill") - 0.1) < 1e-9)
    assert(r("varied") > 0.5)
  }

  test("fingerprint is row-order and partition independent") {
    val a = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
    val shuffled = a.orderBy(rand(7)).repartition(7)
    val fa = DataQuality.fingerprint(a, Seq(col("k"), col("v"))).head()
    val fb = DataQuality.fingerprint(shuffled, Seq(col("k"), col("v"))).head()
    assert(fa == fb)
    assert(fa.getLong(0) == 100L)
  }

  test("fingerprint detects a single-value change") {
    val a = (1L to 100L).map(i => (i, s"v$i")).toDF("k", "v")
    val b = (1L to 100L).map(i => (i, if (i == 42L) "V42" else s"v$i")).toDF("k", "v")
    val fa = DataQuality.fingerprint(a, Seq(col("k"), col("v"))).head()
    val fb = DataQuality.fingerprint(b, Seq(col("k"), col("v"))).head()
    assert(fa.getLong(0) == fb.getLong(0) && fa.getLong(1) != fb.getLong(1))
  }

  test("sourceKeywords: rare-in-other-sources terms outrank shared ones") {
    val d = Seq((1L, "x x common", "s1"), (2L, "y common", "s2"))
      .toDF("doc_id", "text", "source")
    val r = TextAnalysis.sourceKeywords(d, k = 2).orderBy("source", "rank")
      .select("source", "rank", "term", "score")
      .as[(String, Int, String, Double)].collect().toSeq
    // n_sources=2; s1: x tf=2 df=1 -> 4.0, common tf=1 df=2 -> 1.0
    //              s2: y tf=1 df=1 -> 2.0, common -> 1.0
    assert(r == Seq(
      ("s1", 1, "x", 4.0), ("s1", 2, "common", 1.0),
      ("s2", 1, "y", 2.0), ("s2", 2, "common", 1.0)))
  }

  test("cmSketchAudit: estimates only overcount, and a wide sketch is collision-free exact") {
    val docs = graft.sources.TestData.documents(spark, sf)
    val audit = TextAnalysis.cmSketchAudit(docs)
      .as[(String, Long, Long, Long)].collect()
    assert(audit.length == 20)
    audit.foreach { case (tok, exact, est, over) =>
      assert(est >= exact, s"CM must never undercount ($tok: $est < $exact)")
      assert(over == est - exact)
    }
    // width >> vocabulary: every token gets its own cells in at least one
    // row of the sketch, so the min-estimate collapses to the exact count
    val wide = TextAnalysis.cmSketchAudit(docs, depth = 6, width = 1 << 20)
      .as[(String, Long, Long, Long)].collect()
    wide.foreach { case (tok, exact, est, _) =>
      assert(est == exact, s"collision-free sketch must be exact ($tok: $est != $exact)")
    }
  }

  test("cmSketchAudit: exact counts on a constructed corpus") {
    val docs = Seq(
      (1L, "a a a b"), (2L, "a b c"), (3L, "c c d")).toDF("doc_id", "text")
    val audit = TextAnalysis.cmSketchAudit(docs, depth = 4, width = 4096, topK = 4)
      .as[(String, Long, Long, Long)].collect()
      .map { case (t, e, _, _) => t -> e }.toMap
    assert(audit == Map("a" -> 4L, "b" -> 2L, "c" -> 3L, "d" -> 1L))
  }

  test("docSurprisal: integer floor-log2 unigram bits on a hand-computed corpus") {
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    // N = 5; c(a) = 3 -> floor(log2(5 div 3 = 1)) = 0 bits;
    // c(b) = c(c) = 1 -> floor(log2(5)) = 2 bits
    val r = TextAnalysis.docSurprisal(docs)
      .select("doc_id", "n_tokens", "surprisal_bits", "bits_per_token")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(r == Seq((1L, 3L, 2L, 2.0 / 3.0), (2L, 2L, 2L, 1.0)))
  }

  test("docSurprisal: rarer tokens always cost at least as many bits") {
    val docs = graft.sources.TestData.documents(spark, sf).limit(50)
    val r = TextAnalysis.docSurprisal(docs)
      .agg(min("bits_per_token"), max("bits_per_token"))
      .as[(Double, Double)].head()
    assert(r._1 >= 0.0 && r._2 >= r._1)
  }

  test("bpeTrain: hand-traced rounds — overlap-counted picks, non-overlapping merges") {
    // vocab: "aa" x2 -> <a><a>, "ab" x1 -> <a><b>
    // round 1: pair (a,a) freq 2 beats (a,b) freq 1; merge -> <aa>, <a><b>
    //          corpus symbols after: 2*1 + 1*2 = 4
    // round 2: only (a,b) freq 1 remains; merge -> symbols 2*1 + 1*1 = 3
    val d = docs((1L, "aa aa ab"))
    val r = TextAnalysis.bpeTrain(d, rounds = 2).orderBy("round")
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(r == Seq((1, "<a><a>", 2L, 4L), (2, "<a><b>", 1L, 3L)))
    // "aaa": counts see BOTH overlapping (a,a) pairs, the merge replaces
    // leftmost non-overlapping -> <aa><a>, 2 symbols (the reference
    // algorithm's documented asymmetry)
    val tri = TextAnalysis.bpeTrain(docs((1L, "aaa")), rounds = 1)
      .as[(Int, String, Long, Long)].collect().head
    assert(tri == ((1, "<a><a>", 2L, 2L)))
  }

  test("bpeTrain: compression curve decreases, pick frequency never rises") {
    val d = graft.sources.TestData.documents(spark, sf).limit(80)
    val rows = TextAnalysis.bpeTrain(d, rounds = 3).orderBy("round")
      .as[(Int, String, Long, Long)].collect().toSeq
    assert(rows.length == 3)
    assert(rows.map(_._4) == rows.map(_._4).sorted.reverse,
      s"corpus symbols must fall every merge: ${rows.map(_._4)}")
    assert(rows.map(_._3) == rows.map(_._3).sorted.reverse,
      s"merge freq is non-increasing across rounds: ${rows.map(_._3)}")
  }

  test("paretoFrontier: hand-built frontier with both-axes ties kept, dominated cut") {
    // (n_chars, q): id1 (3,2) frontier; id2 (3,1) dominated at equal cost;
    // id3 (7,4) frontier; id4 (7,4) both-axes TIE with id3 — also frontier
    // (neither dominates); id5 (9,3) dominated by id3 (cheaper AND richer);
    // id6 (11,5) frontier (richest overall)
    val d = docs(
      (1L, "a b"), (2L, "c c"),
      (3L, "a b c d"), (4L, "w x y z"),
      (5L, "p p q r p"), (6L, "a b c d e f"))
    val res = TextAnalysis.paretoFrontier(d)
      .select("doc_id").as[Long].collect().toSet
    assert(res == Set(1L, 3L, 4L, 6L))
  }

  test("paretoFrontier: equals the brute-force dominance definition on real docs") {
    val d = graft.sources.TestData.documents(spark, sf).limit(120)
    val scored = d.selectExpr("doc_id", "n_chars",
        "CAST(size(array_distinct(split(text, ' '))) AS BIGINT) AS q")
      .as[(Long, Long, Long)].collect()
    val brute = scored.filter { case (id, c, q) =>
      !scored.exists { case (id2, c2, q2) =>
        id2 != id && c2 <= c && q2 >= q && (c2 < c || q2 > q)
      }
    }.map(_._1).toSet
    val res = TextAnalysis.paretoFrontier(d).select("doc_id").as[Long].collect().toSet
    assert(res == brute, s"engine=${res.size} brute=${brute.size}")
  }
  test("bpeEncode applies the trained merges, passing 1-char words through") {
    // words: ab(x2), abc, x -> round-1 pair counts: <a><b> freq 3 (from
    // ab, ab, abc), <b><c> freq 1 -> merge <ab>. Encoding: 'ab' -> 1
    // symbol, 'abc' -> <ab><c> = 2, 'x' (never trained: 1-char) -> 1.
    val d = docs(1L -> "ab ab abc", 2L -> "x abc")
    val r = TextAnalysis.bpeEncode(d, rounds = 1).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        (x.getAs[Long]("n_words"), x.getAs[Long]("syms_before"),
          x.getAs[Long]("syms_after"))).toMap
    assert(r(1L) == ((3L, 7L, 4L)), s"doc 1: ab+ab+abc = 1+1+2 symbols: $r")
    assert(r(2L) == ((2L, 4L, 3L)), s"doc 2: x+abc = 1+2 symbols: $r")
  }

  test("q293: the chunk grid, cross-doc duplicate detection, and the no-dup baseline") {
    def docs(rows: (Long, String, String)*) =
      rows.toDF("doc_id", "text", "source")
    // width 4, stride 3: a 7-token doc chunks at starts 0, 3, 6 —
    // [t0..t3], [t3..t6], [t6] (truncated tail kept)
    val seven = "a b c d e f g"
    val r1 = TextAnalysis.chunkDedup(docs((1L, seven, "s0")),
      width = 4, stride = 3).head()
    assert(r1.getAs[Long]("n_chunks") == 3L
      && r1.getAs[Long]("n_distinct") == 3L
      && r1.getAs[Long]("dup_chunks") == 0L
      && r1.getAs[Double]("dup_ratio") == 0.0, s"grid: $r1")
    // two docs sharing their full text: every chunk duplicated once
    val r2 = TextAnalysis.chunkDedup(
      docs((1L, seven, "s0"), (2L, seven, "s0")), width = 4, stride = 3)
      .head()
    assert(r2.getAs[Long]("n_chunks") == 6L
      && r2.getAs[Long]("n_distinct") == 3L
      && r2.getAs[Long]("dup_chunks") == 3L
      && r2.getAs[Double]("dup_ratio") == 0.5, s"cross-doc: $r2")
    // sources aggregate independently: the same text in another source
    // does not pollute s0's distinct count
    val r3 = TextAnalysis.chunkDedup(
      docs((1L, seven, "s0"), (2L, seven, "s1")), width = 4, stride = 3)
      .collect().map(x => x.getString(0) -> x.getAs[Long]("dup_chunks"))
      .toMap
    assert(r3 == Map("s0" -> 0L, "s1" -> 0L), s"source isolation: $r3")
  }

  test("q300: each stage filters what it owns; short docs mint no shingles") {
    def docs(rows: (Long, String, String)*) =
      rows.toDF("doc_id", "text", "source")
    val longText = (1 to 24).map(i => s"tok$i").mkString(" ")    // quality-ok
    val benchText = (1 to 24).map(i => s"ev$i").mkString(" ")    // benchmark
    val contamText = ((1 to 8).map(i => s"ev$i") ++              // shares the
      (1 to 16).map(i => s"pad$i")).mkString(" ")                // ev1..ev8 gram
    val repeats = (1 to 24).map(_ => "same").mkString(" ")       // low distinct
    val fx = docs(
      (1L, longText, "s0"), (2L, longText, "s0"),   // exact dup -> one out
      (3L, "short doc", "s0"),                      // < 20 tokens -> quality
      (4L, repeats, "s0"),                          // distinct ratio -> quality
      (97L, benchText, "s0"),                       // benchmark doc -> out
      (5L, contamText, "s0"),                       // 8-gram sharer -> out
      (6L, (1 to 24).map(i => s"uniq$i").mkString(" "), "s0"))
    val r = TextAnalysis.curationPipeline(fx, minTokens = 20, quota = 15)
      .collect().map(x => x.getString(0) -> ((x.getLong(2), x.getLong(3))))
      .toMap
    assert(r("a_raw")._1 == 7L, s"raw: $r")
    assert(r("b_dedup")._1 == 6L, "the exact dup must collapse to one")
    // quality drops the short doc and the all-same doc (not the bench)
    assert(r("c_quality")._1 == 4L, s"quality: $r")
    // decontam drops the benchmark doc itself AND the gram-sharer
    assert(r("d_decontam")._1 == 2L, s"decontam: $r")
    assert(r("e_quota")._1 == 2L, "quota above survivor count keeps all")
    assert(r("d_decontam")._2 == 48L, "survivors: doc1 + doc6, 24 tokens each")
    // a 7-token benchmark doc mints NO shingles (the sequence(1,0)
    // cross-engine trap): nothing else may be dropped because of it
    val tiny = docs(
      (97L, "a b c d e f g", "s0"),                 // bench, 7 tokens
      (1L, (1 to 24).map(i => s"x$i").mkString(" "), "s0"))
    val t = TextAnalysis.curationPipeline(tiny, minTokens = 20, quota = 15)
      .collect().map(x => x.getString(0) -> x.getLong(2)).toMap
    assert(t("d_decontam") == 1L && t("e_quota") == 1L,
      s"short bench doc must not contaminate anything: $t")
  }

  test("q323: cross-doc spans merge into islands; within-doc repeats and short docs score zero") {
    val docs = Seq(
      (0L, "t0 t1 t2 t3 t4 t5"),  // two overlapping cross-doc spans
      (1L, "t0 t1 t2 x1 x2 x3"),  // shares [t0 t1 t2] with d0
      (2L, "t2 t3 t4 y1 y2 y3"),  // shares [t2 t3 t4] with d0
      (3L, "w w w w w w w w"),    // repeats only WITHIN itself
      (4L, "z1 z2 z3 z4"),        // unique
      (5L, "s1 s2"))              // shorter than the span length
      .toDF("doc_id", "text")
    val got = TextAnalysis.duplicatedSpanAudit(docs, n = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // d0's duplicated intervals [0,2] (from d1) and [2,4] (from d2)
    // OVERLAP — the island union counts 5 tokens, never 6
    assert(got == Map(
      0L -> ((6L, 5L)), 1L -> ((6L, 3L)), 2L -> ((6L, 3L)),
      3L -> ((8L, 0L)), 4L -> ((4L, 0L)), 5L -> ((2L, 0L))), s"$got")
  }

  test("q323: testdata fractions are bounded and dup_tokens never exceeds n_tokens") {
    val got = TextAnalysis.duplicatedSpanAudit(
      graft.sources.TestData.documents(spark, sf)).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(2) >= 0L && r.getLong(2) <= r.getLong(1), s"$r")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0, s"$r")
    }
  }
}
