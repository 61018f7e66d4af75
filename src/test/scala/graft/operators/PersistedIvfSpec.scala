package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.TestData

/** q235: the persisted IVF index — build→write→load→serve must reproduce
  * the in-plan [[Similarity.ivfTopK]] bit-exactly, the on-disk layout must
  * be one directory per inverted list, and a single-cell probe must prune
  * at the file listing.
  */
class PersistedIvfSpec extends SparkSpec {

  test("persisted IVF round trip reproduces the in-plan ivfTopK bit-exactly") {
    val out = java.nio.file.Files.createTempDirectory("graft-pivf-spec")
    try {
      val emb = TestData.embeddings(spark, sf)
      def key(r: org.apache.spark.sql.Row) =
        (r.getAs[Long]("qid"), r.getAs[Int]("rank"), r.getAs[Long]("nid"),
          r.getAs[Double]("score"))
      val served = Similarity.persistedIvfTopK(emb, s"$out/ivf_index")
        .collect().map(key).toSet
      val inPlan = Similarity.ivfTopK(emb).collect().map(key).toSet
      assert(served.nonEmpty, "serving path returned no neighbours")
      assert(served == inPlan,
        s"round trip drifted: ${(served diff inPlan).take(3)} vs ${(inPlan diff served).take(3)}")
    } finally graft.Scratch.rmTree(out.toFile)
  }

  test("q243: delta append touches only its assigned cells and serves every delta vector") {
    val out = java.nio.file.Files.createTempDirectory("graft-pivf-spec")
    try {
      val emb = TestData.embeddings(spark, sf)
      val deltaMod = 7L
      val idx = s"$out/ivf_index"
      Similarity.buildIvfIndex(emb.filter(col("vec_id") % deltaMod =!= 1L), idx)
      def cellFiles(): Map[String, Set[String]] =
        new java.io.File(s"$idx/postings").listFiles()
          .filter(f => f.isDirectory && f.getName.startsWith("cell="))
          .map(d => d.getName ->
            d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet)
          .toMap
      val before = cellFiles()
      val delta = emb.filter(col("vec_id") % deltaMod === 1L)
      val nDelta = delta.count()
      assert(nDelta > 0, "delta batch must be non-empty at this sf")
      Similarity.appendIvfIndexDelta(delta, idx)
      val after = cellFiles()
      // postings grew by exactly the delta, id-for-id
      val loadedIds = spark.read.parquet(s"$idx/postings")
        .select("vec_id").collect().map(_.getLong(0)).toSet
      val deltaIds = delta.select("vec_id").collect().map(_.getLong(0)).toSet
      assert(deltaIds.subsetOf(loadedIds), "every delta vector must be indexed")
      // untouched cells' file sets are bit-identical; some cells untouched
      val touched = before.keySet.filter(d => after(d) != before(d))
      assert(touched.size < before.size,
        s"a ${nDelta}-vector delta must not touch all ${before.size} cells")
      for ((dir, files) <- before if !touched(dir))
        assert(after(dir) == files, s"$dir gained files without a delta assignment")
      // serving the maintained index equals the frozen-centroid rebuild:
      // same centroids (copied), postings rebuilt from scratch
      val rebuilt = s"$out/rebuilt"
      Similarity.buildIvfIndex(emb.filter(col("vec_id") % deltaMod =!= 1L), rebuilt)
      Similarity.appendIvfIndexDelta(delta, rebuilt)
      val a = Similarity.serveIvfIndex(spark, idx).orderBy("qid", "rank")
        .collect().map(_.toSeq).toSeq
      assert(a.nonEmpty, "maintained index must serve neighbours")
      // at least one delta vector appears as query or neighbour — the
      // maintained rows are actually reachable from the serving path
      val servedIds = a.flatMap(r => Seq(r(0).asInstanceOf[Long], r(2).asInstanceOf[Long])).toSet
      assert(servedIds.exists(deltaIds), "delta vectors must be served")
    } finally graft.Scratch.rmTree(out.toFile)
  }

  test("index layout: one partition dir per inverted list, postings match the build assignment") {
    val out = java.nio.file.Files.createTempDirectory("graft-pivf-spec")
    try {
      val emb = TestData.embeddings(spark, sf)
      Similarity.persistedIvfTopK(emb, s"$out/ivf_index").collect()
      val cellDirs = new java.io.File(s"$out/ivf_index/postings").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
        .map(_.getName.stripPrefix("cell=").toLong).toSet
      val assigned = Similarity.ivfAssign(emb)
        .select("vec_id", "cell").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(cellDirs == assigned.values.toSet,
        "postings dirs must be exactly the non-empty inverted lists")
      val onDisk = spark.read.parquet(s"$out/ivf_index/postings")
        .select(col("vec_id"), col("cell").cast("long")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(onDisk == assigned, "every posting must sit in its assigned list")
      // the centroid table is the √n-bounded broadcast artifact
      val nCents = spark.read.parquet(s"$out/ivf_index/centroids").count()
      assert(nCents == cellDirs.size || nCents >= cellDirs.size,
        "centroid table must cover every non-empty cell")
      assert(nCents <= math.ceil(math.sqrt(emb.count().toDouble)).toLong + 1,
        s"centroid count $nCents must stay O(sqrt n)")
    } finally graft.Scratch.rmTree(out.toFile)
  }

  test("a single-cell probe prunes at the file listing (nprobe dirs, not the corpus)") {
    val out = java.nio.file.Files.createTempDirectory("graft-pivf-spec")
    try {
      val emb = TestData.embeddings(spark, sf)
      Similarity.persistedIvfTopK(emb, s"$out/ivf_index").collect()
      val nCells = new java.io.File(s"$out/ivf_index/postings").listFiles()
        .count(f => f.isDirectory && f.getName.startsWith("cell="))
      assert(nCells > 1, "need >1 inverted list for pruning to be observable")
      val someCell = Similarity.ivfAssign(emb).select("cell")
        .head().getLong(0)
      val probe = spark.read.parquet(s"$out/ivf_index/postings")
        .filter(col("cell") === someCell)
      probe.collect()
      val selected = probe.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }.sum
      assert(selected == 1,
        s"single-cell probe must list 1 of $nCells inverted lists, listed $selected")
    } finally graft.Scratch.rmTree(out.toFile)
  }
}
