package graft.operators

import graft.SparkSpec
import graft.sources.TestData

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank matches an independent fixed-point reference exactly") {
    val docs = TestData.documents(spark, sf)
    // reference implementation: same recurrence, plain Scala Longs over
    // the collected candidate graph (collect is fine in a test)
    val pairs = Dedup.lshCandidates(docs).select("doc_a", "doc_b")
      .as[(Long, Long)].collect()
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val adj = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    val n = adj.size
    assert(n > 0, "no candidate pairs at this sf — test needs a graph")
    val init = Graph.Scale / n
    val base = 15L * init / 100L
    var r: Map[Long, Long] = adj.keys.map(_ -> init).toMap
    for (_ <- 1 to 5) {
      val recv = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      adj.foreach { case (u, vs) =>
        val share = r(u) / vs.size
        vs.foreach(v => recv(v) += share)
      }
      r = adj.keys.map(v => v -> (base + 85L * recv(v) / 100L)).toMap
    }
    val got = Graph.pagerank(docs).select("doc_id", "rank_fp")
      .as[(Long, Long)].collect().toMap
    assert(got == r)
  }

  test("pagerank conserves mass up to floor leakage, all ranks positive") {
    val pr = Graph.pagerank(TestData.documents(spark, sf))
      .select("rank_fp").as[Long].collect()
    assert(pr.forall(_ > 0))
    val total = pr.sum
    assert(total <= Graph.Scale, s"mass above Scale: $total")
    assert(total >= Graph.Scale * 8 / 10, s"floor leakage too large: $total")
  }

  test("pagerank rejects a non-positive iteration count") {
    val docs = TestData.documents(spark, sf)
    intercept[IllegalArgumentException](Graph.pagerank(docs, iters = 0))
  }
}
