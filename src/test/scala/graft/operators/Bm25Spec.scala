package graft.operators

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: (Long, String)*): DataFrame =
    texts.toDF("doc_id", "text")
      .selectExpr("doc_id", "text", "'en' AS lang", "'t' AS source",
        "CAST(length(text) AS BIGINT) AS n_chars")

  private val corpus = docs(
    0L -> "spark query join spark query join spark",  // all terms, high tf
    1L -> "spark query engines run fast today",       // two terms
    2L -> "a join is a relational operator",          // one term
    3L -> "completely unrelated words about cats",    // no terms
    4L -> "spark",                                    // one term, short doc
    5L -> "the the the the the the the the the the")  // no terms, long doc

  private val terms = Seq("spark", "query", "join")

  test("bm25 ranks by term coverage and frequency; k bounds the output") {
    val res = TextAnalysis.bm25(corpus, terms, k = 4)
      .select("doc_id", "score", "matched")
      .as[(Long, Double, Int)].collect().toSeq
    assert(res.length == 4, "k must bound the output")
    assert(res.map(_._1).head == 0L, "doc with all terms at high tf ranks first")
    assert(res.map(_._2) == res.map(_._2).sorted.reverse, "descending scores")
    assert(res.forall(_._2 > 0.0), "top-k scores are positive")
    val byDoc = res.map(r => r._1 -> r._3).toMap
    assert(byDoc(0L) == 3 && byDoc.get(3L).isEmpty)
  }

  test("zero-match documents score exactly zero") {
    val all = TextAnalysis.bm25(corpus, terms, k = 10)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(all(3L) == 0.0 && all(5L) == 0.0)
  }

  test("document frequency dampens the contribution (rarer term wins at equal tf)") {
    // 'query' appears in 2 docs, 'join' in 2, 'spark' in 3 → at equal tf a
    // doc holding only the rarer term must not score below one holding only
    // a more common term of the same tf and length.
    val c2 = docs(
      0L -> "spark alpha beta gamma delta",
      1L -> "query alpha beta gamma delta",
      2L -> "spark other words here now",
      3L -> "spark more words here again")
    val res = TextAnalysis.bm25(c2, Seq("spark", "query"), k = 4)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(res(1L) >= res(0L), "rarer term (df=1) outranks common term (df=3) at equal tf")
  }

  test("repetition: dominant-trigram fraction; too-short docs excluded") {
    val c = docs(
      0L -> "a b c a b c a b c",    // 7 trigrams; "a b c" appears 3x
      1L -> "one two three four five", // 3 distinct trigrams, max_rep 1
      2L -> "x y")                  // < 3 tokens → no row
    val m = TextAnalysis.repetition(c)
      .as[(Long, Long, Long, Double)].collect()
      .map(t => t._1 -> (t._2, t._3, t._4)).toMap
    assert(m.keySet == Set(0L, 1L))
    assert(m(0L) == ((7L, 3L, 3.0 / 7)))
    assert(m(1L) == ((3L, 1L, 1.0 / 3)))
  }
}
