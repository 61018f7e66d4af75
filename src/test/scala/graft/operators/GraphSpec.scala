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

  test("pagerankResiduals: exact per-round L1 residuals, monotone geometric decay") {
    val docs = TestData.documents(spark, sf)
    // independent reference: same plain-Scala recurrence as above, but
    // tracking the L1 residual after every round
    val pairs = Dedup.lshCandidates(docs).select("doc_a", "doc_b")
      .as[(Long, Long)].collect()
    val edges = pairs.flatMap { case (a, b) => Seq((a, b), (b, a)) }
    val adj = edges.groupBy(_._1).map { case (u, es) => u -> es.map(_._2) }
    val n = adj.size
    val init = Graph.Scale / n
    val base = 15L * init / 100L
    var r: Map[Long, Long] = adj.keys.map(_ -> init).toMap
    val expected = (1 to 5).map { _ =>
      val recv = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      adj.foreach { case (u, vs) =>
        val share = r(u) / vs.size
        vs.foreach(v => recv(v) += share)
      }
      val next = adj.keys.map(v => v -> (base + 85L * recv(v) / 100L)).toMap
      // iterator, not .keys.map: a Set would dedup equal per-vertex diffs
      val resid = adj.keys.iterator.map(v => math.abs(next(v) - r(v))).sum
      r = next
      resid
    }
    val got = Graph.pagerankResiduals(docs)
      .select("round", "residual_fp").as[(Int, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == (1 to 5), "one residual per round")
    assert(got.map(_._2).toSeq == expected, "residuals must match the reference exactly")
    // the convergence claim itself: monotone decay at (better than) the
    // damping rate — this is what justifies a FIXED iters=5 at any scale
    // (contraction depends on damping, not corpus size). The banded
    // candidate graph is a union of small near-dup families, so the
    // residual typically hits EXACTLY 0 within a round or two; once zero
    // it must stay zero.
    got.map(_._2).sliding(2).foreach { case Array(a, b) =>
      if (a == 0L) assert(b == 0L, s"residual rebounded from zero: $b")
      else assert(b.toDouble / a.toDouble < 0.9,
        s"contraction slower than damping suggests: $a -> $b")
    }
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

  test("triangleStats: the default degree cap is moot on the test corpus") {
    val docs = TestData.documents(spark, sf)
    val maxDeg = Graph.triangleStats(docs)
      .agg(org.apache.spark.sql.functions.max("degree")).as[Long].head()
    assert(maxDeg < 4096, s"corpus grew a hub ($maxDeg) — revisit the cap evidence")
    val capped = Graph.triangleStats(docs)
      .select("doc_id", "degree", "triangles").as[(Long, Long, Long)].collect().toSet
    val uncapped = Graph.triangleStats(docs, maxDegree = Int.MaxValue)
      .select("doc_id", "degree", "triangles").as[(Long, Long, Long)].collect().toSet
    assert(capped == uncapped, "default cap must not change the banded-graph output here")
  }

  test("triangleStats hub cap: hubs report NULL, wedge work excludes their edges") {
    import org.apache.spark.sql.functions.col
    // star hub 100 with leaves 1..5 (degree 5), plus a separate triangle
    // 10-11-12 and a triangle 1-2-100 routed through the hub
    val hubEdges = (1L to 5L).map(l => (l, 100L)) ++
      Seq((10L, 11L), (10L, 12L), (11L, 12L), (1L, 2L))
    val e = hubEdges.toDF("a", "b").select(
      org.apache.spark.sql.functions.least(col("a"), col("b")).as("a"),
      org.apache.spark.sql.functions.greatest(col("a"), col("b")).as("b"))
    val byId = Graph.triangleStatsFromEdges(e, maxDegree = 4)
      .select("doc_id", "degree", "triangles")
      .collect().map(row => (row.getLong(0), (row.getLong(1),
        if (row.isNullAt(2)) None else Some(row.getLong(2))))).toMap
    assert(byId(100L)._1 == 5L, "true degree is still reported for the hub")
    assert(byId(100L)._2.isEmpty, "hub above the cap is excluded, not zeroed")
    assert(byId(10L)._2.contains(1L) && byId(11L)._2.contains(1L)
      && byId(12L)._2.contains(1L), "triangles away from the hub stay exact")
    assert(byId(1L)._2.contains(0L) && byId(2L)._2.contains(0L),
      "the hub-routed triangle is not counted once hub edges are excluded")
    // uncapped control: the hub triangle IS counted when the cap is high
    val full = Graph.triangleStatsFromEdges(e, maxDegree = 100)
      .select("doc_id", "triangles")
      .collect().map(row => (row.getLong(0), row.getLong(1))).toMap
    assert(full(1L) == 1L && full(100L) == 1L)
  }

  test("assortativity: a perfect star is exactly -1; a clique has no variance (NULL)") {
    val star = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    val r = Graph.assortativityFromPairs(star)
      .select("m", "sx", "sxy", "sxx", "assortativity").head()
    assert(r.getLong(0) == 6L && r.getLong(1) == 12L)
    assert(r.getLong(2) == 18L && r.getLong(3) == 30L)
    assert(r.getDouble(4) == -1.0)
    // triangle: all degrees 2 -> zero variance -> NULL, not NaN
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("doc_a", "doc_b")
    assert(Graph.assortativityFromPairs(tri).head().isNullAt(6))
  }

  test("q271: pointer doubling resolves exact depths on the DIV-2 forest") {
    // keys 0..14: a full binary heap — depth(v) = floor(log2(v+1)) under
    // parent = v DIV 2 with root 0... verify against the direct walk:
    // 0 -> d0; 1 -> 0 (d1); 2 -> 1 -> 0 (d2); ...; 14 -> 7 -> 3 -> 1 -> 0
    import org.apache.spark.sql.functions.{col, lit}
    val cust = spark.range(15).select(
      col("id").cast("int").as("c_custkey"), lit(1.0).as("c_acctbal"))
    val r = Graph.hierarchyClosure(cust).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    // depth -> (n_nodes, cents): v=0,1 at d<=1... explicit: depths of
    // 0..14 are 0,1,2,2,3,3,3,3,4,4,4,4,4,4,4 under this DIV-2 chain
    assert(r == Map(
      0L -> ((1L, 100L)), 1L -> ((1L, 100L)), 2L -> ((2L, 200L)),
      3L -> ((4L, 400L)), 4L -> ((7L, 700L))), s"got $r")
  }

  test("q271: a gapped keyspace fails the coverage guard loudly") {
    // keys 0..7 plus an orphan block at 1e8..1e8+7 (the old ScaleBench
    // copy offset): every orphan's DIV-2 parent is missing, so the inner
    // self-join would silently shed them and 'converge' over the
    // survivors — the guard must turn that into a loud failure instead
    // of a partial answer.
    import org.apache.spark.sql.functions.{col, lit}
    val gapped = spark.range(8).select(col("id"))
      .union(spark.range(100000000L, 100000008L).select(col("id")))
      .select(col("id").cast("int").as("c_custkey"), lit(1.0).as("c_acctbal"))
    val ex = intercept[IllegalArgumentException] {
      Graph.hierarchyClosure(gapped).collect()
    }
    assert(ex.getMessage.contains("dropped"), s"wrong failure: $ex")
    // and the DENSE 10x-style scaling (offset = base key count) keeps
    // the forest total: 0..29 is just a deeper heap, all 30 nodes out
    val dense = spark.range(30).select(
      col("id").cast("int").as("c_custkey"), lit(1.0).as("c_acctbal"))
    val out = Graph.hierarchyClosure(dense).collect()
    assert(out.map(_.getLong(1)).sum == 30L, "dense keyspace: all nodes")
  }
}
