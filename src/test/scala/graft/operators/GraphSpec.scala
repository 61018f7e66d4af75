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

  test("triangleStats matches a brute-force triangle count") {
    val docs = TestData.documents(spark, sf)
    val pairs = Dedup.lshCandidates(docs).select("doc_a", "doc_b")
      .as[(Long, Long)].collect().toSet
    val verts = pairs.flatMap { case (a, b) => Seq(a, b) }.toSeq.sorted
    val deg = verts.map(v => v ->
      pairs.count { case (a, b) => a == v || b == v }.toLong).toMap
    // brute force: every unordered triple with all three edges present
    val triOf = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      (a, b) <- pairs; c <- verts if c > b
      if pairs((b, c)) && pairs((a, c))
    } { triOf(a) += 1; triOf(b) += 1; triOf(c) += 1 }
    val got = Graph.triangleStats(docs)
      .select("doc_id", "degree", "triangles")
      .as[(Long, Long, Long)].collect()
    assert(got.map(_._1).sorted.toSeq == verts)
    got.foreach { case (v, d, t) =>
      assert(d == deg(v), s"degree mismatch at $v")
      assert(t == triOf(v), s"triangle mismatch at $v")
    }
  }
}
