package graft.operators

import graft.SparkSpec
import graft.sources.TestData

/** Span-level dedup coverage and the minhash-vs-exact-Jaccard audit. */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val shared = (1 to 8).map(i => s"s$i").mkString(" ")

  test("dupSpans covers exactly the cross-doc duplicated 8-gram positions") {
    val docs = Seq(
      (1L, s"a1 a2 $shared b1 b2"),            // 12 toks, shared span at 2..9
      (2L, s"c1 $shared"),                     // 9 toks, shared span at 1..8
      (3L, (1 to 10).map(i => s"u$i").mkString(" ")), // unique
      (4L, "x y z")                            // shorter than n: zero coverage
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpans(docs, n = 8).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out(1L) == ((12L, 8L)))
    assert(out(2L) == ((9L, 8L)))
    assert(out(3L) == ((10L, 0L)))
    assert(out(4L) == ((3L, 0L)))
  }

  test("a span repeated WITHIN one document only is not cross-doc duplicated") {
    val docs = Seq(
      (1L, s"$shared $shared"),                // same 8-gram twice, one doc
      (2L, (1 to 12).map(i => s"v$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpans(docs, n = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 0L && out(2L) == 0L)
  }

  test("overlapping duplicated spans merge into one covered interval") {
    // doc 2 repeats doc 1's tokens 0..9 → 8-grams at positions 0,1,2 in
    // doc 1 are all duplicated; coverage is the UNION 0..9 = 10, not 3*8.
    val run = (1 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"$run t1 t2"),
      (2L, s"z1 z2 z3 $run")
    ).toDF("doc_id", "text")
    val out = Dedup.dupSpans(docs, n = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out(1L) == 10L && out(2L) == 10L)
  }

  test("minhash estimate: band-sharing implies >= rowsPerBand agreements; " +
      "high-J pairs estimate within sampling error; low-J pairs only OVERestimate") {
    val out = Dedup.minhashEstimatePairs(TestData.documents(spark, sf)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val agree = r.getAs[Long]("n_agree")
      val j = r.getAs[Long]("n_inter").toDouble / r.getAs[Long]("n_union")
      val est = agree / 16.0
      // sharing one band = its 4 slots all equal
      assert(agree >= 4, s"pair ${r.get(0)}-${r.get(1)}: n_agree $agree < 4")
      // true near-dups: binomial(16, J) within ~3 standard errors + slot granularity
      if (j >= 0.5)
        assert(math.abs(est - j) <= 3 * math.sqrt(j * (1 - j) / 16) + 1.0 / 16,
          s"pair ${r.get(0)}-${r.get(1)}: est $est vs exact $j")
      // LSH SELECTION BIAS, measured: a low-J pair only reaches the
      // candidate set when its signature got lucky, so the estimate can
      // only err upward — the audit proves banding never UNDERSTATES
      // similarity of what it surfaces.
      else assert(est >= j - 1.0 / 16,
        s"pair ${r.get(0)}-${r.get(1)}: low-J pair underestimated ($est < $j)")
    }
  }
}
