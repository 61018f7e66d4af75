package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.TestData

/** q247: the persisted IVF-PQ (IVFADC) index — compressed-code layout,
  * exact-duplicate retrieval through the ADC path, physical cell
  * pruning, and serve-side determinism from the loaded artifacts.
  */
class PqIndexSpec extends SparkSpec {
  import spark.implicits._

  test("an exact duplicate of the query ranks first through the ADC path") {
    val out = java.nio.file.Files.createTempDirectory("graft-pq-spec")
    try {
      // 40 random vectors; id 27 duplicates id 0 (a query: 0 % 10 == 0).
      // Identical vectors coarse-route identically and encode to the
      // same codes, so the duplicate's ADC distance is the per-subspace
      // minimum the query itself achieves — nothing can rank above it.
      val rnd = new scala.util.Random(7)
      val vecs = (0L until 40L).map { i =>
        i -> Array.fill(8)((rnd.nextFloat() * 2 - 1))
      }.toMap
      val emb = (0L until 40L)
        .map(i => (i, if (i == 27L) vecs(0L) else vecs(i)))
        .toDF("vec_id", "embedding")
      val rows = Similarity.persistedPqTopK(emb, s"$out/pq_index", k = 3)
        .collect()
      val res = rows
        .map(r => (r.getAs[Long]("qid"), r.getAs[Int]("rank")) -> r.getAs[Long]("nid"))
        .toMap
      assert(res((0L, 1)) == 27L, s"exact duplicate must rank first: $res")
      // ranks are contiguous from 1 with non-decreasing ADC distance
      for ((qid, qRows) <- rows.groupBy(_.getAs[Long]("qid"))) {
        val byRank = qRows.sortBy(_.getAs[Int]("rank"))
        assert(byRank.map(_.getAs[Int]("rank")).toSeq == (1 to byRank.length),
          s"query $qid ranks must be contiguous")
        val dists = byRank.map(_.getAs[Long]("adc_dist")).toSeq
        assert(dists == dists.sorted, s"query $qid distances must be sorted")
      }
    } finally graft.Scratch.rmTree(out.toFile)
  }

  test("codes are genuinely compressed: one row per vector, m codeword ids each") {
    val out = java.nio.file.Files.createTempDirectory("graft-pq-spec")
    try {
      val emb = TestData.embeddings(spark, sf)
      Similarity.buildPqIndex(emb, s"$out/pq_index", m = 4)
      val codes = spark.read.parquet(s"$out/pq_index/codes")
      assert(codes.count() == emb.count(), "every vector carries exactly one code row")
      assert(codes.filter(size(col("codes")) =!= 4).count() == 0,
        "every code is m = 4 codeword ids")
      // every stored id resolves in its subspace's codebook
      val cb = spark.read.parquet(s"$out/pq_index/codebooks")
        .select(col("cb"), col("cid").as("cbid"))
      val exploded = codes
        .select(col("vec_id"), posexplode(col("codes")).as(Seq("b", "cid")))
      val dangling = exploded.join(cb,
        exploded("b") === cb("cb") && exploded("cid") === cb("cbid"), "left_anti")
      assert(dangling.count() == 0, "no code may point outside its codebook")
    } finally graft.Scratch.rmTree(out.toFile)
  }

  test("the cell layout prunes physically: a one-cell filter opens one partition dir") {
    val out = java.nio.file.Files.createTempDirectory("graft-pq-spec")
    try {
      Similarity.buildPqIndex(TestData.embeddings(spark, sf), s"$out/pq_index")
      val codesDir = s"$out/pq_index/codes"
      val cells = new java.io.File(codesDir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      assert(cells.length > 1)
      val someCell = cells.map(_.getName.stripPrefix("cell=").toLong).min
      val probe = spark.read.parquet(codesDir).filter(col("cell") === someCell)
      probe.collect()
      val selected = probe.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }.sum
      assert(selected == 1,
        s"one-cell scan must open 1 of ${cells.length} dirs, opened $selected")
    } finally graft.Scratch.rmTree(out.toFile)
  }

  test("serving twice from the same artifacts is deterministic") {
    val out = java.nio.file.Files.createTempDirectory("graft-pq-spec")
    try {
      val emb = TestData.embeddings(spark, sf)
      Similarity.buildPqIndex(emb, s"$out/pq_index")
      def serve() = Similarity.servePqIndex(emb, s"$out/pq_index")
        .collect().map(_.toString).sorted.toSeq
      assert(serve() == serve())
    } finally graft.Scratch.rmTree(out.toFile)
  }
}
