package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.TestData

/** The two-pass Misra-Gries plan must return EXACTLY the true heavy-hitter
  * set (the pass-1 sketch may over-generate candidates; pass 2's exact
  * confirm must kill every false positive and the pigeonhole superset
  * guarantee must keep every true one).
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def exact(docs: org.apache.spark.sql.DataFrame, k: Int) = {
    val toks = docs.select(explode(split(col("text"), " ")).as("token"))
      .filter(length(col("token")) > 0)
    val n = toks.count()
    toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * k > n)
      .select(col("token"), col("cnt"), lit(n).as("n"))
  }

  test("matches the exact full group-by on the corpus") {
    val docs = TestData.documents(spark, sf)
    val hh = TextAnalysis.heavyHitters(docs, k = 30)
    assert(hh.count() > 0, "degenerate test: no heavy hitters at k=30")
    assert(hh.exceptAll(exact(docs, 30)).count() === 0)
    assert(exact(docs, 30).exceptAll(hh).count() === 0)
  }

  test("adversarial spread: a hitter light in most partitions still survives") {
    // 'hot' has global share 1/4 > 1/5 (k=5) but is diluted across MANY
    // partitions full of unique fillers, so per-partition MG summaries are
    // dominated by noise — the cross-partition pigeonhole must still
    // surface it in at least one partition's summary.
    val docs = spark.range(0, 400).repartition(16)
      .select(col("id").as("doc_id"),
        concat_ws(" ", lit("hot"),
          concat(lit("u"), col("id") * 3), concat(lit("u"), col("id") * 3 + 1),
          concat(lit("u"), col("id") * 3 + 2)).as("text"))
    val hh = TextAnalysis.heavyHitters(docs, k = 5)
      .select("token", "cnt").as[(String, Long)].collect().toMap
    assert(hh == Map("hot" -> 400L))
  }
}
