package graft.operators

import graft.SparkSpec

/** Budget-greedy packing semantics: a document straddling the budget
  * boundary stays in the sequence where it started; shard boundaries start
  * fresh sequences.
  */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, nTokens: Int, source: String = "s") =
    (id, Seq.fill(nTokens)("w").mkString(" "), source)

  test("straddling doc stays in its starting sequence; next doc opens the new one") {
    // budget 10: docs of 6,6,6 tokens -> prev_cums 0,6,12 -> seqs 0,0,1:
    // the second doc STARTS under budget (prev_cum 6 < 10) so it packs
    // into seq 0 even though it overflows it; the third starts at 12.
    val docs = Seq(doc(1, 6), doc(2, 6), doc(3, 6)).toDF("doc_id", "text", "source")
    val out = Packing.packSequences(docs, budget = 10, shardSize = 100)
      .orderBy("seq_id").collect()
      .map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(out.toSeq === Seq((0L, 2L, 12L), (1L, 1L, 6L)))
  }

  test("shard boundary resets the running budget") {
    // shardSize 2: docs 1,2 in shard 0, docs 3,4 in shard 1 (ids 2,3 -> 1)
    // wait: shard = id div 2 -> ids 1,2,3,4 -> shards 0,1,1,2
    val docs = Seq(doc(1, 6), doc(2, 6), doc(3, 6), doc(4, 6))
      .toDF("doc_id", "text", "source")
    val out = Packing.packSequences(docs, budget = 10, shardSize = 2)
      .orderBy("shard", "seq_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // shard 0: doc1 alone (seq 0); shard 1: docs 2,3 pack greedily
    // (prev_cums 0,6 -> both seq 0); shard 2: doc4 alone (seq 0)
    assert(out.toSeq === Seq((0L, 0L, 1L), (1L, 0L, 2L), (2L, 0L, 1L)))
  }

  test("every document is packed exactly once (token totals conserved)") {
    val docs = graft.sources.TestData.documents(spark, sf)
    val packed = Packing.packSequences(docs)
    import org.apache.spark.sql.functions._
    val packedTotals = packed.agg(sum("n_docs"), sum("seq_tokens")).head()
    val docTotals = docs.agg(count(lit(1)),
      sum(size(split(col("text"), " ")).cast("long"))).head()
    assert(packedTotals.getLong(0) === docTotals.getLong(0))
    assert(packedTotals.getLong(1) === docTotals.getLong(1))
  }

  test("chunkDocs: stride windows with overlap; tail chunk is short") {
    // 5 tokens, window 3, stride 2 -> chunks "a b c", "c d e", "e"
    val docs = Seq((1L, "a b c d e", "s")).toDF("doc_id", "text", "source")
    val r = Packing.chunkDocs(docs, window = 3, stride = 2)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start_tok", "chunk_tokens")
      .as[(Long, Long, Int)].collect().toSeq
    assert(r == Seq((0L, 0L, 3), (1L, 2L, 3), (2L, 4L, 1)))
  }

  test("chunkDocs: fingerprint matches an independent md5 of the chunk text") {
    def fp(s: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 12), 16)
    }
    val docs = Seq((1L, "a b c d e", "s")).toDF("doc_id", "text", "source")
    val r = Packing.chunkDocs(docs, window = 3, stride = 2)
      .orderBy("chunk_idx").select("chunk_fp").as[Long].collect().toSeq
    assert(r == Seq(fp("a b c"), fp("c d e"), fp("e")))
  }

  test("chunkDocs: a doc at or under the window yields exactly one chunk") {
    val docs = Seq((1L, "a b c", "s"), (2L, "x", "s"))
      .toDF("doc_id", "text", "source")
    val r = Packing.chunkDocs(docs, window = 3, stride = 3)
      .groupBy("doc_id").count().orderBy("doc_id")
      .as[(Long, Long)].collect().toSeq
    assert(r == Seq((1L, 1L), (2L, 1L)))
  }

  test("chunkDocs rejects a stride above the window") {
    val docs = Seq((1L, "a", "s")).toDF("doc_id", "text", "source")
    intercept[IllegalArgumentException](
      Packing.chunkDocs(docs, window = 4, stride = 5))
  }

  test("contextLengthPlan: exact ceil/pad arithmetic on a hand-checked grid") {
    // docs of 3, 5, 8 tokens on grid (4, 8):
    //  L=4: seqs ceil(3/4)+ceil(5/4)+ceil(8/4) = 1+2+2 = 5;
    //       pad (4-3)+(4-5%4)+0 = 1+3+0 = 4
    //  L=8: seqs 1+1+1 = 3; pad 5+3+0 = 8
    val docs = Seq(doc(1, 3), doc(2, 5), doc(3, 8)).toDF("doc_id", "text", "source")
    val out = Packing.contextLengthPlan(docs, grid = Seq(4, 8))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5)))
    assert(out.toSeq === Seq(
      (4, 3L, 16L, 5L, 4L, 4.0 / 20.0),
      (8, 3L, 16L, 3L, 8L, 8.0 / 24.0)))
  }

  test("contextLengthPlan: token totals are grid-invariant; pad+tokens = seqs*L") {
    val docs = Seq(doc(1, 7), doc(2, 13), doc(3, 29), doc(4, 1))
      .toDF("doc_id", "text", "source")
    val rows = Packing.contextLengthPlan(docs, grid = Seq(2, 16, 64)).collect()
    val totals = rows.map(_.getLong(2)).distinct
    assert(totals.toSeq === Seq(50L), "total_tokens must not depend on the grid")
    rows.foreach { r =>
      val (l, seqs, pad) = (r.getInt(0).toLong, r.getLong(3), r.getLong(4))
      assert(r.getLong(2) + pad === seqs * l,
        s"L=$l: tokens + pad must exactly fill the padded sequences")
    }
  }
}
