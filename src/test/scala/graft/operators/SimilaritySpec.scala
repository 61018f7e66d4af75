package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.LongArrayDot.long_dot

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("LongArrayDot: codegen and interpreted paths agree with manual result") {
    val df = Seq((Array(1L, 2L, 3L), Array(4L, 5L, 6L))).toDF("a", "b")
    // codegen path
    assert(df.select(long_dot(col("a"), col("b"))).head().getLong(0) == 32L)
    // interpreted path (eval via filter on the driver-evaluable expression)
    val expr = graft.plans.LongArrayDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1L, 2L, 3L)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(4L, 5L, 6L)))
    assert(expr.eval(null) == 32L)
  }

  test("VectorCentroid aggregator is partition-invariant (merge correctness)") {
    import graft.functions.OracleSafe.quant
    def centroids(parts: Int) = {
      val q = graft.sources.TestData.embeddings(spark, sf)
        .repartition(parts)
        .select(col("label"), transform(col("embedding"), x => quant(x)).as("q"))
        .as[(Int, Seq[Long])]
      q.groupByKey(_._1).mapValues(_._2)
        .agg(graft.functions.VectorCentroid.toColumn.name("c"))
        .collect().toMap
    }
    assert(centroids(1) == centroids(7))
  }

  test("lshBuckets drops empty/null embeddings instead of minting a bucket-0 row") {
    // parity with the oracle's unnest (no elements → no group); a bucket-0
    // row for an empty vector would join everything in bucket 0 with
    // NaN cosine scores
    val df = Seq(
      (1L, Array(0.5f, -0.2f, 0.9f), 0),
      (2L, Array.empty[Float], 0),
      (3L, null.asInstanceOf[Array[Float]], 0),
      (4L, Array(0.1f, 0.8f, -0.4f), 1))
      .toDF("vec_id", "embedding", "label")
    val ids = Similarity.lshBuckets(df).select("vec_id").as[Long].collect().toSet
    assert(ids == Set(1L, 4L))
  }

  test("long_dot is registered for SQL via SparkSessionExtensions") {
    val r = spark.sql(
      "SELECT long_dot(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS d").head().getLong(0)
    assert(r == 32L)
  }

  test("brute-force top-k: nearest neighbour of a duplicated vector is its twin with score ~1") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (10L, Array(1.0f, 0.0f, 0.0f, 0.0f)), // identical to 0
      (11L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (12L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (13L, Array(-1.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val top = Similarity.bruteForceTopK(emb, k = 2, queryMod = 10)
      .filter(col("qid") === 0).orderBy("rank")
      .select("nid", "score").as[(Long, Double)].collect()
    assert(top(0)._1 == 10L && math.abs(top(0)._2 - 1.0) < 1e-9)
    assert(top(1)._1 == 11L)
  }

  test("identical vectors land in the same LSH bucket") {
    val emb = Seq(
      (0L, Array.fill(8)(0.5f)),
      (1L, Array.fill(8)(0.5f)),
      (2L, Array.fill(8)(-0.5f))).toDF("vec_id", "embedding")
    val buckets = Similarity.lshBuckets(emb).as[(Long, Int)].collect().toMap
    assert(buckets(0L) == buckets(1L))
    assert(buckets(0L) != buckets(2L)) // opposite vector flips every plane sign
  }

  test("lshTopK finds the exact twin when it shares the bucket") {
    val emb = Seq(
      (0L, Array.fill(8)(0.5f)),
      (5L, Array.fill(8)(0.5f))).toDF("vec_id", "embedding")
    val res = Similarity.lshTopK(emb, k = 1, queryMod = 10)
      .select("qid", "nid", "score").as[(Long, Long, Double)].collect()
    assert(res.length == 1 && res(0)._1 == 0L && res(0)._2 == 5L
      && math.abs(res(0)._3 - 1.0) < 1e-9)
  }

  test("embeddingNearDups flags identical vectors at any threshold") {
    val emb = Seq(
      (0L, Array(0.3f, -0.2f, 0.9f)),
      (1L, Array(0.3f, -0.2f, 0.9f)),
      (2L, Array(-0.9f, 0.4f, 0.1f))).toDF("vec_id", "embedding")
    val pairs = Similarity.embeddingNearDups(emb, threshold = 0.99)
      .select("vec_a", "vec_b").as[(Long, Long)].collect()
    assert(pairs.toSeq == Seq((0L, 1L)))
  }

  test("semanticDedup keeps the smallest id of a duplicate pair, drops the rest") {
    // 0 and 7 are exact duplicates; the rest sit >=0.5 rad apart on a
    // circle (pairwise cosine <= 0.91), far from the 0.999 threshold
    val emb = (0 until 12).map { i =>
      val v =
        if (i == 0 || i == 7) Array(0.3f, -0.2f, 0.9f)
        else Array(math.cos(i * 0.5).toFloat, math.sin(i * 0.5).toFloat, -0.5f)
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val r = Similarity.semanticDedup(emb, threshold = 0.999)
      .orderBy("vec_id").select("vec_id", "dropped")
      .as[(Long, Int)].collect().toMap
    assert(r(0L) == 0, "senior duplicate must be kept")
    assert(r(7L) == 1, "junior duplicate must be dropped")
    assert(r.count(_._2 == 1) == 1, "only the junior twin drops")
    assert(r.size == 12, "one row per input vector")
  }

  test("semanticDedup similarity chain: domination drops the whole tail, not greedy re-admission") {
    // Chain A~B, B~C, A!~C at ids 0<1<2: angles 0 deg / 25 deg / 50 deg in
    // the xy-plane, threshold 0.8 sits between cos(25 deg)=0.906 and
    // cos(50 deg)=0.643. True greedy selection would re-admit C after
    // dropping B; the documented domination rule drops C too (B is senior
    // to C whether or not B itself survives). n=9 makes cent_mod=3, so id 0
    // is the only centroid seed near the chain and ids 0,1,2 share a cell;
    // ids 3..8 sit z-dominant far away (cosine to the chain ~0.3).
    val emb = ((0 until 3).map { i =>
      (i.toLong, Array(math.cos(i * 0.4363).toFloat, math.sin(i * 0.4363).toFloat, 0f))
    } ++ (3 until 9).map { i =>
      (i.toLong, Array(math.cos(i.toDouble).toFloat, math.sin(i.toDouble).toFloat, -3f))
    }).toDF("vec_id", "embedding")
    val r = Similarity.semanticDedup(emb, threshold = 0.8)
      .select("vec_id", "dropped").as[(Long, Int)].collect().toMap
    assert(r(0L) == 0, "chain head is kept")
    assert(r(1L) == 1, "B is dominated by A")
    assert(r(2L) == 1,
      "C must drop under the domination rule (dominated by B) even though greedy would keep it")
  }

  test("negativeSamples: negatives come from foreign buckets, deterministically") {
    val emb = graft.sources.TestData.embeddings(spark, sf)
    val buckets = Similarity.lshBuckets(emb)
    val negs = Similarity.negativeSamples(emb, k = 3)
    val joined = negs
      .join(buckets.withColumnRenamed("vec_id", "qid")
        .withColumnRenamed("bucket", "qb"), "qid")
      .join(buckets.withColumnRenamed("vec_id", "neg_id")
        .withColumnRenamed("bucket", "nb"), "neg_id")
    assert(joined.count() > 0)
    assert(joined.filter(col("qb") === col("nb")).count() == 0,
      "a negative shared its query's bucket — false-negative exclusion broken")
    assert(negs.groupBy("qid").count().filter(col("count") > 3).count() == 0)
    val a = negs.collect().map(_.toString).sorted.toSeq
    val b = Similarity.negativeSamples(emb, k = 3).collect().map(_.toString).sorted.toSeq
    assert(a == b)
  }

  test("k-means refinement pulls centroids onto the true cluster centers") {
    // two tight, well-separated clusters around +0.8 and -0.8 on every dim;
    // ids interleaved so the modulo seeding draws from both clusters
    val dim = 8
    val rows = (0 until 40).map { i =>
      val center = if (i % 2 == 0) 0.8f else -0.8f
      val noise = (i % 5) * 0.01f
      (i.toLong, Array.fill(dim)(center + noise), i % 2)
    }
    val emb = rows.toDF("vec_id", "embedding", "label")
    val cents = Similarity.ivfKmeansCentroids(emb)
      .as[(Long, Int, Double)].collect()
    assert(cents.nonEmpty)
    // means are on the 1e4 quantization grid (same convention as q58);
    // every refined per-dim mean must sit inside one cluster's tight band,
    // never between the clusters (a sampling-only "centroid" could)
    cents.foreach { case (cid, d, m) =>
      assert(math.abs(math.abs(m / 1e4) - 0.8) < 0.1,
        s"centroid $cid dim $d mean $m not on a cluster center")
    }
  }

  test("ivfRecallCurve: recall is monotone in probe depth, bounded, and consistent") {
    val rows = Similarity.ivfRecallCurve(graft.sources.TestData.embeddings(spark, sf))
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(1, 2, 4))
    rows.foreach { case (_, hits, recall) =>
      assert(recall >= 0.0 && recall <= 1.0)
      assert(hits >= 0L)
    }
    // a candidate pool that only grows with nprobe can only gain hits
    // (candidates ranked above an exact-top-k member are themselves in the
    // exact top-k under the shared total order)
    assert(rows.map(_._2).toSeq == rows.map(_._2).sorted.toSeq,
      s"hits must be non-decreasing in nprobe: $rows")
    // probing deeper than one cell must help or tie, never regress to zero
    assert(rows.last._3 >= rows.head._3)
  }

  test("matryoshkaRankAudit: untruncated dims give rho = 1; results stay in [-1, 1]") {
    val emb = graft.sources.TestData.embeddings(spark, sf)
    // truncating to the full width changes nothing -> both rankings agree
    val dim = emb.selectExpr("max(size(embedding)) d").as[Int].head()
    val same = Similarity.matryoshkaRankAudit(emb, dims = dim)
      .as[(Long, Long, Long, Option[Double])].collect()
    assert(same.nonEmpty)
    same.foreach { case (qid, _, d2, rho) =>
      assert(d2 == 0L && rho.contains(1.0), s"full-width audit must be perfect for $qid")
    }
    val cut = Similarity.matryoshkaRankAudit(emb, dims = 16)
      .as[(Long, Long, Long, Option[Double])].collect()
    cut.foreach { case (qid, n, _, rho) =>
      assert(n >= 2 && rho.isDefined)
      assert(rho.get >= -1.0 && rho.get <= 1.0, s"rho out of range for $qid: $rho")
    }
  }

  test("embeddingAudit: empty, null, and zero vectors are counted per label") {
    val e = Seq(
      (1L, Some(Seq(0.5f)), 0),        // valid, n2 = 5000^2
      (2L, Some(Seq(0.0f)), 0),        // valid but all-zero
      (3L, None: Option[Seq[Float]], 0), // missing
      (4L, Some(Seq.empty[Float]), 1)) // empty
      .toDF("vec_id", "embedding", "label")
    val r = Similarity.embeddingAudit(e).orderBy("label").collect()
    val l0 = r(0)
    assert((l0.getInt(0), l0.getLong(1), l0.getLong(2), l0.getLong(3)) == ((0, 3L, 1L, 1L)))
    assert(l0.getLong(4) == 0L && l0.getLong(5) == 25000000L)
    assert(l0.getDouble(6) == 12500000.0)
    val l1 = r(1)
    assert((l1.getInt(0), l1.getLong(1), l1.getLong(2), l1.getLong(3)) == ((1, 1L, 1L, 0L)))
    assert(l1.isNullAt(4) && l1.isNullAt(5) && l1.isNullAt(6))
  }

  test("pqAudit: an all-identical corpus has zero distortion and one code per subspace") {
    val v = Array(0.1f, 0.2f, 0.3f, 0.4f, -0.1f, -0.2f, -0.3f, -0.4f)
    val emb = (0L to 3L).map(i => (i, v)).toDF("vec_id", "embedding")
    val r = Similarity.pqAudit(emb, m = 4)
      .select("subspace", "n_vecs", "codes_used", "total_sqerr")
      .as[(Int, Long, Long, Long)].collect()
    assert(r.map(_._1).toSeq == Seq(0, 1, 2, 3))
    assert(r.forall { case (_, n, used, err) => n == 4L && used == 1L && err == 0L })
  }

  test("pqAudit: distortion is bounded by assigning to ANY seed (audit never inflates)") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 1.0f, 0.0f)),
      (3L, Array(0.5f, 0.5f, 0.5f, 0.5f))).toDF("vec_id", "embedding")
    // n = 4 -> cent_mod = 2 -> seeds {0, 2}; with m = 2 each subspace has
    // 2 codewords; every vector's sqerr must be <= its distance to seed 0
    val total = Similarity.pqAudit(emb, m = 2)
      .agg(sum("total_sqerr")).as[Long].head()
    // distance of each vector to seed 0 summed over both subspaces
    // (vec 0: 0; vec 1: 2e8; vec 2: 0; vec 3: 0.5e8 * ... ) — the audit's
    // argmin can only be tighter than this fixed assignment
    assert(total >= 0L)
    val q = 10000L
    val worst = // sum over vecs of ||x - seed0||^2, exact on the grid
      (0L + // vec 0 is seed 0
        (q * q * 2) + // vec 1 vs seed 0: two dims differ by 1.0
        0L + // vec 2 is seed 2 (exact)
        4 * (q / 2) * (q / 2)) // vec 3: four dims differ by 0.5
    assert(total <= worst)
  }

  test("kcenterCoreset: greedy picks the farthest point; radii never increase") {
    val emb = Seq(
      (0L, Array(0.0f, 0.0f)),
      (1L, Array(1.0f, 1.0f)),
      (2L, Array(0.1f, 0.0f))).toDF("vec_id", "embedding")
    val r = Similarity.kcenterCoreset(emb, k = 3)
      .select("step", "center_id", "radius").as[(Int, Long, Long)].collect()
    assert(r.map(_._2).toSeq == Seq(0L, 1L, 2L),
      "start at min id, then the far corner, then the leftover")
    assert(r.map(_._3).toSeq == r.map(_._3).sorted.reverse.toSeq,
      "coverage radius must be non-increasing")
    assert(r.last._3 == 0L, "after k = n centers every point is covered exactly")
  }

  test("gramAudit: exact second moments and covariance numerators on a known frame") {
    val emb = Seq(
      (0L, Array(1.0f, 2.0f)),
      (1L, Array(3.0f, 4.0f))).toDF("vec_id", "embedding")
    val r = Similarity.gramAudit(emb)
      .select("i", "j", "second_moment", "cov_num")
      .as[(Int, Int, Long, Long)].collect().toSeq
    // q = [10000, 20000], [30000, 40000]
    val e8 = 100000000L
    assert(r == Seq(
      (1, 1, 10 * e8, 2 * 10 * e8 - 40000L * 40000L),
      (1, 2, 14 * e8, 2 * 14 * e8 - 40000L * 60000L),
      (2, 2, 20 * e8, 2 * 20 * e8 - 60000L * 60000L)))
  }

  test("indexShardPlan: loads sum to the corpus; cells deal out within one of even") {
    val emb = graft.sources.TestData.embeddings(spark, sf)
    val valid = emb.filter(
      org.apache.spark.sql.functions.size(
        org.apache.spark.sql.functions.col("embedding")) > 0).count()
    val rows = Similarity.indexShardPlan(emb, shards = 4).collect()
    assert(rows.length == 4, "every shard must appear")
    assert(rows.map(_.getLong(2)).sum == valid,
      "shard loads must partition the assignable vectors exactly")
    val cellCounts = rows.map(_.getLong(1))
    assert(cellCounts.max - cellCounts.min <= 1,
      "round-robin dealing must spread cells within one of even")
    val loads = rows.map(_.getDouble(3))
    assert(loads.forall(l => l > 0.0), "no shard may be empty at this sf")
    assert(math.abs(loads.sum - 4.0) < 1e-9,
      "load_x_shards must average exactly 1 across shards")
  }

  test("retrievalRankingEval matches an independent driver-side recomputation exactly") {
    val emb = graft.sources.TestData.embeddings(spark, sf)
    val k = 5
    // independent reimplementation: collect both top-k lists and compute
    // NDCG/MRR/hits with plain Scala over the SAME integer discount grid
    val exact = Similarity.bruteForceTopK(emb, k)
      .select("qid", "rank", "nid").as[(Long, Int, Long)].collect()
      .groupBy(_._1).map { case (q, rs) =>
        q -> rs.map(r => r._3 -> (k + 1 - r._2).toLong).toMap
      }
    val approx = Similarity.ivfTopK(emb, k)
      .select("qid", "rank", "nid").as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(r => (r._2, r._3))).toMap
    val disc = (1 to k)
      .map(i => i -> math.round(1e6 / (math.log(i + 1.0) / math.log(2.0)))).toMap
    val idcg = (1 to k).map(i => (k - i + 1).toLong * disc(i)).sum
    val got = Similarity.retrievalRankingEval(emb, k)
      .as[(Long, Long, Double, Long, Double)].collect()
    assert(got.map(_._1).toSet == exact.keySet, "one row per exact-side query")
    got.foreach { case (qid, hits, mrr, dcgE6, ndcg) =>
      val rel = exact(qid)
      val ap = approx.getOrElse(qid, Array.empty[(Int, Long)])
      val expHits = ap.count { case (_, nid) => rel.contains(nid) }
      val expDcg = ap.map { case (r, nid) => rel.getOrElse(nid, 0L) * disc(r) }.sum
      val expMrr = ap.collectFirst {
        case (r, nid) if rel.contains(nid) => 1.0 / r
      }.getOrElse(0.0)
      assert(hits == expHits, s"hits($qid)")
      assert(dcgE6 == expDcg, s"dcg_e6($qid)")
      assert(mrr == expMrr, s"mrr($qid)") // exact: single division both paths
      assert(ndcg == expDcg.toDouble / idcg.toDouble, s"ndcg($qid)")
      assert(ndcg >= 0.0 && ndcg <= 1.0 && mrr >= 0.0 && mrr <= 1.0)
      if (hits == 0) assert(ndcg == 0.0 && mrr == 0.0)
    }
    // the suite's sf0.001 corpus must exercise both hit and miss paths
    assert(got.exists(_._2 > 0), "IVF must hit at least once at this sf")
  }

  test("q317: RRF fuses the arms; a both-arms twin wins; scores are self-consistent") {
    val docs = Seq(
      (0L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta"), // lexical twin of the query
      (2L, "alpha beta zz yy"),
      (3L, "qq rr ss tt"),
      (4L, "alpha qq rr ss"),
      (5L, "uu vv ww xx")).toDF("doc_id", "text")
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)), // semantic twin too
      (2L, Array(0.9f, 0.1f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.0f)),
      (4L, Array(0.5f, 0.5f, 0.0f, 0.0f)),
      (5L, Array(0.0f, 0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.hybridRrfTopK(docs, emb, k = 5).collect()
    assert(got.forall(_.getLong(0) == 0L), "only doc 0 is a query at mod 100")
    // the document that tops BOTH arms must top the fusion
    val first = got.find(_.getInt(1) == 1).get
    assert(first.getLong(2) == 1L, s"the twin must win the fusion: $first")
    assert(first.getInt(3) == 1 && first.getInt(4) == 1,
      s"the twin tops both arms: $first")
    // every row's score is the fixed two-term expression of its own ranks
    got.foreach { r =>
      val lex = if (r.isNullAt(3)) None else Some(r.getInt(3))
      val sem = if (r.isNullAt(4)) None else Some(r.getInt(4))
      val expected = lex.map(x => 1.0 / (x + 60).toDouble).getOrElse(0.0) +
        sem.map(x => 1.0 / (x + 60).toDouble).getOrElse(0.0)
      assert(r.getDouble(5) == expected, s"rrf self-consistency: $r")
      assert(lex.nonEmpty || sem.nonEmpty, "a fused row came from some arm")
    }
    // fused order is by rrf desc (nid tie-break)
    val byRank = got.sortBy(_.getInt(1)).map(_.getDouble(5))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
  }

  test("q317: the semantic arm's ranks equal the standalone IVF serve path") {
    val docs = graft.sources.TestData.documents(spark, sf)
    val emb = graft.sources.TestData.embeddings(spark, sf)
    val fusedSem = Similarity.hybridRrfTopK(docs, emb, k = 10, queryMod = 100)
      .filter(col("sem_rank").isNotNull)
      .select("qid", "nid", "sem_rank").as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val ivf = Similarity.ivfTopK(emb, k = 20, queryMod = 100)
      .select("qid", "nid", "rank").as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(fusedSem.nonEmpty, "the semantic arm must surface at this sf")
    fusedSem.foreach { case (key, rank) =>
      assert(ivf.get(key).contains(rank),
        s"fused sem_rank must equal the standalone IVF rank: $key")
    }
  }

  test("q317: a corpus-dominant token adds NO lexical candidates (df cap binds)") {
    // 200 docs all share the stop-token "the" (df = 200 > cap = max(64,
    // 200/20) = 64). Only docs 0 and 1 also share a RARE token
    // "common0" (df = 2, kept). If the cap were not enforced, every doc
    // would be a lexical candidate of the query through "the"; with it,
    // the query's only lexical candidate is doc 1, and query 100 (whose
    // kept tokens are all unique) has none.
    val docs = (0L until 200L).map { i =>
      val text =
        if (i <= 1L) s"the common0 x$i y$i" else s"the x$i y$i z$i"
      (i, text)
    }.toDF("doc_id", "text")
    val emb = (0L until 200L).map { i =>
      (i, Array(((i % 7) + 1).toFloat, ((i % 5) + 1).toFloat,
        ((i % 3) + 1).toFloat, 1.0f))
    }.toDF("vec_id", "embedding")
    val got = Similarity.hybridRrfTopK(docs, emb, k = 30, armK = 20)
      .select("qid", "nid", "lex_rank", "rrf").collect()
    val lexByQ = got.filter(!_.isNullAt(2))
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    assert(lexByQ.getOrElse(0L, Set.empty) == Set(1L),
      s"query 0's only lexical candidate is its rare-token partner: $lexByQ")
    assert(!lexByQ.contains(100L),
      s"query 100 shares only the capped stop-token => no lexical arm: $lexByQ")
    // the kept pair is scored as true Jaccard over the CAPPED token
    // space: |{common0}| / |{common0,x0,y0} ∪ {common0,x1,y1}| = 1/5,
    // making it lex_rank 1 — the capped token neither adds candidates
    // nor perturbs the kept candidates' scores.
    val pair = got.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L).get
    assert(pair.getInt(2) == 1, s"rare-token partner is lex_rank 1: $pair")
  }

  test("q318: fresh ground truth is reused; a corpus delta invalidates it") {
    val dir = java.nio.file.Files.createTempDirectory("gt318").toString
    def corpus(n: Long) = (0L until n).map { i =>
      (i, Array(((i % 7) + 1).toFloat, ((i % 5) + 1).toFloat,
        ((i % 3) + 1).toFloat, 1.0f))
    }.toDF("vec_id", "embedding")
    val base = corpus(40)
    val (v1, b1) = Similarity.ensureGroundTruth(base, dir, k = 3)
    assert(v1 == 1L && b1, "first call publishes v1")
    val (v2, b2) = Similarity.ensureGroundTruth(base, dir, k = 3)
    assert(v2 == 1L && !b2, "same corpus => artifact reused, no rebuild")
    val v1Rows = graft.operators.ManifestTable
      .readVersion(spark, dir, 1L).count()
    // a corpus delta (10 appended vectors) changes the fingerprint
    val (v3, b3) = Similarity.ensureGroundTruth(corpus(50), dir, k = 3)
    assert(v3 == 2L && b3, "corpus delta => stale artifact, new version")
    // the superseded version stays readable for pinned evals
    assert(graft.operators.ManifestTable
      .readVersion(spark, dir, 1L).count() == v1Rows)
    // and v2's content IS the from-scratch exact top-k of the new corpus
    val scratch = Similarity.bruteForceTopK(corpus(50), k = 3)
      .orderBy("qid", "rank").collect().toSeq
    val artifact = graft.operators.ManifestTable.readVersion(spark, dir, 2L)
      .orderBy("qid", "rank").collect().toSeq
    assert(artifact == scratch, "published GT equals the exact pass")
  }

  test("q318: eval from the artifact equals the from-scratch q310 eval") {
    val emb = graft.sources.TestData.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("gt318e").toString
    val fromArtifact = Similarity.persistedGroundTruthEval(emb, dir)
      .drop("gt_version").orderBy("qid").collect().toSeq
    val fromScratch = Similarity.retrievalRankingEval(emb)
      .orderBy("qid").collect().toSeq
    assert(fromArtifact == fromScratch)
  }

  test("q320: per-config metrics are bounded, monotone in probe depth, and hit-consistent with q155") {
    val emb = graft.sources.TestData.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("gt320").toString
    val got = Similarity.multiProbeEvalFromGroundTruth(emb, dir)
      .collect().sortBy(_.getInt(0))
    assert(got.map(_.getInt(0)).toSeq == Seq(1, 2, 4))
    // one query spine for every config
    assert(got.map(_.getLong(1)).distinct.length == 1)
    got.foreach { r =>
      val (recall, ndcg, mrr) =
        (r.getDouble(3), r.getDouble(5), r.getDouble(6))
      assert(recall >= 0.0 && recall <= 1.0, s"recall: $r")
      assert(ndcg >= 0.0 && ndcg <= 1.0, s"mean_ndcg: $r")
      assert(mrr >= 0.0 && mrr <= 1.0, s"mrr: $r")
    }
    // a candidate entering at a deeper probe can only displace a
    // LOWER-cosine item, and the exact top-k is ranked by the same
    // cosine — so every metric is non-decreasing in probe depth
    Seq(2, 3, 5, 6).foreach { i =>
      val vals = got.map(r => r.get(i).toString.toDouble)
      assert(vals.zip(vals.tail).forall { case (a, b) => a <= b },
        s"column $i must be monotone in nprobe: ${vals.toSeq}")
    }
    // hits agree with the standalone q155 recall curve, config for config
    val curve = Similarity.ivfRecallCurve(emb)
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    got.foreach(r => assert(curve(r.getInt(0)) == r.getLong(2),
      s"hits must match the q155 curve at nprobe ${r.getInt(0)}"))
  }

  test("q321: maintained ground truth equals the rebuild; both delta paths fire; versions line up") {
    val emb = graft.sources.TestData.embeddings(spark, sf)
    val dir = java.nio.file.Files.createTempDirectory("gt321").toString
    val maintained = Similarity.incrementalGroundTruth(emb, dir)
      .collect().toSeq
    val rebuilt = Similarity.bruteForceTopK(emb)
      .orderBy("qid", "rank").collect().toSeq
    assert(maintained == rebuilt,
      "delta maintenance must be indistinguishable from the full rebuild")
    // both maintenance paths genuinely fired at this sf: some existing
    // query gained a delta neighbour, and some query IS a delta vector
    assert(maintained.exists(r =>
      r.getLong(2) % 7L == 1L && r.getLong(0) % 7L != 1L),
      "a delta candidate must enter an existing query's top-k")
    assert(maintained.exists(_.getLong(0) % 7L == 1L),
      "a delta query must be served from its one full pass")
    // version lineage: v1 = base GT, v2 = maintained full GT, and the
    // content address resolves to the maintained version
    assert(graft.operators.ManifestTable.currentVersion(spark, dir)
      .contains(2L))
    val (v, rebuilt2) = Similarity.ensureGroundTruth(emb, dir)
    assert(v == 2L && !rebuilt2,
      "the maintained artifact must be fresh for the full corpus")
  }

  test("q322: post-filter underfills, over-fetch recovers, filter-aware bounds — monotone by construction") {
    val emb = graft.sources.TestData.embeddings(spark, sf)
    val got = Similarity.filteredAnnAudit(emb).collect()
      .map(r => r.getString(0) -> r).toMap
    val (a, b, c) =
      (got("a_post_filter"), got("b_over_fetch"), got("c_filter_aware"))
    // one query spine everywhere
    assert(Seq(a, b, c).map(_.getLong(1)).distinct.length == 1)
    // served(a) ⊆ served(b) ⊆ candidates(c): hits and fill are monotone
    assert(a.getLong(4) <= b.getLong(4) && b.getLong(4) <= c.getLong(4),
      s"hits must be monotone: $a $b $c")
    assert(a.getLong(2) <= b.getLong(2) && b.getLong(2) <= c.getLong(2),
      s"fill must be monotone: $a $b $c")
    assert(a.getLong(3) >= b.getLong(3) && b.getLong(3) >= c.getLong(3),
      s"underfill must be anti-monotone: $a $b $c")
    // the production story is visible at this sf: the black-box
    // post-filter (40% selectivity) genuinely loses slots that the
    // filter-aware path serves
    assert(a.getLong(2) < c.getLong(2),
      s"post-filter must measurably underfill vs filter-aware: $a $c")
    Seq(a, b, c).foreach { r =>
      assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0)
      assert(r.getLong(2) <= r.getLong(1) * 5, "fill is capped at nq*k")
    }
  }
}
