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

  test("selection is deterministic: same subset on every invocation") {
    val corpus = docs(300, "s")
    val a = Sampling.stratifiedSample(corpus, Seq(), defaultPct = 30)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val b = Sampling.stratifiedSample(corpus, Seq(), defaultPct = 30)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(a == b && a.nonEmpty)
  }
}
