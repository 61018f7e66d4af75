package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.TestData

/** q239: the persisted inverted text index — hand-checked intersection
  * semantics, losslessness vs a direct text scan, and physical bucket
  * pruning on the postings layout.
  */
class InvertedIndexSpec extends SparkSpec {
  import spark.implicits._

  test("hand-checked AND semantics on a tiny corpus") {
    // df: a=4 b=3 c=2 z=2 q=1 → rare = [q, c] (ties by term), common = [a, b, c]
    val docs = Seq((1L, "a b c"), (2L, "a b"), (3L, "a z"), (4L, "a b c z q"))
      .toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("graft-iti-spec")
    try {
      val got = TextAnalysis.invertedIndexLookup(docs, s"$out/idx").collect()
        .map(r => r.getAs[String]("query_id") ->
          ((r.getAs[Long]("n_terms"), r.getAs[Long]("n_docs"),
            r.getAs[Long]("sum_doc_ids")))).toMap
      assert(got("rare_pair") == ((2L, 1L, 4L)), "q AND c matches only doc 4")
      assert(got("rare_common") == ((2L, 1L, 4L)), "q AND a matches only doc 4")
      assert(got("common_triple") == ((3L, 2L, 5L)), "a AND b AND c matches docs 1+4")
    } finally graft.Scratch.rmTree(out.toFile)
  }

  test("the index round trip is lossless vs a direct token scan of the corpus") {
    val docs = TestData.documents(spark, sf)
    val out = java.nio.file.Files.createTempDirectory("graft-iti-spec")
    try {
      val got = TextAnalysis.invertedIndexLookup(docs, s"$out/idx").collect()
        .map(r => r.getAs[String]("query_id") ->
          ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_doc_ids")))).toMap
      // re-derive each query's terms the way the serving path does, then
      // answer it from the RAW text (no index): array_contains on tokens
      val dict = spark.read.parquet(s"$out/idx/dict")
      val rare = dict.orderBy(col("df").asc, col("term"))
        .select("term").limit(2).as[String].collect()
      val common = dict.orderBy(col("df").desc, col("term"))
        .select("term").limit(3).as[String].collect()
      val queries = Map(
        "rare_pair" -> rare.toSeq,
        "rare_common" -> Seq(rare(0), common(0)).distinct,
        "common_triple" -> common.toSeq)
      for ((qid, terms) <- queries) {
        val direct = docs.filter(terms.map(t =>
            array_contains(split(col("text"), " "), t)).reduce(_ && _))
          .agg(count(lit(1)), coalesce(sum("doc_id"), lit(0L)))
          .head()
        assert(got(qid) == ((direct.getLong(0), direct.getLong(1))),
          s"$qid: index answer must equal the direct scan")
        assert(direct.getLong(0) > 0L, s"$qid should match something at this sf")
      }
    } finally graft.Scratch.rmTree(out.toFile)
  }

  test("q240: delta append touches only its buckets and serves the rebuilt answer") {
    val docs = TestData.documents(spark, sf)
    val deltaMod = 10L
    val out = java.nio.file.Files.createTempDirectory("graft-iti-spec")
    try {
      val idx = s"$out/idx"
      TextAnalysis.buildInvertedIndex(
        docs.filter(col("doc_id") % deltaMod =!= 0L), idx)
      def bucketFiles(): Map[String, Set[String]] =
        new java.io.File(s"$idx/postings").listFiles()
          .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
          .map(d => d.getName ->
            d.listFiles().map(_.getName).filter(_.endsWith(".parquet")).toSet)
          .toMap
      val before = bucketFiles()
      val delta = docs.filter(col("doc_id") % deltaMod === 0L)
      TextAnalysis.appendInvertedIndexDelta(delta, idx)
      val after = bucketFiles()
      // which buckets SHOULD the delta touch? exactly its terms' hashes
      val touched = delta
        .select(explode(split(col("text"), " ")).as("term"))
        .select(pmod(conv(substring(md5(col("term")), 1, 12), 16, 10)
          .cast("long"), lit(16L)).as("b"))
        .distinct().as[Long].collect().map(b => s"bucket=$b").toSet
      assert(touched.nonEmpty && touched.size < 16,
        s"spec needs a partial touch set to be meaningful, got ${touched.size}")
      for ((dir, files) <- before) {
        if (touched(dir))
          assert(after(dir).size > files.size && files.subsetOf(after(dir)),
            s"$dir is in the delta's term set — it must GAIN files")
        else
          assert(after(dir) == files,
            s"$dir is outside the delta's term set — its files must be untouched")
      }
      // the maintained index serves exactly what a from-scratch rebuild serves
      val served = TextAnalysis
        .serveInvertedIndex(spark, idx, dictDir = "dict_v2")
        .collect().map(_.toSeq).toSeq
      val rebuilt = TextAnalysis
        .invertedIndexLookup(docs, s"$out/rebuilt")
        .collect().map(_.toSeq).toSeq
      assert(served == rebuilt,
        "serving from the maintained artifacts must equal the rebuilt index")
    } finally graft.Scratch.rmTree(out.toFile)
  }

  test("postings prune physically: a one-bucket probe opens one shard dir") {
    val out = java.nio.file.Files.createTempDirectory("graft-iti-spec")
    try {
      TextAnalysis.invertedIndexLookup(TestData.documents(spark, sf), s"$out/idx")
        .collect()
      val postings = s"$out/idx/postings"
      val buckets = new java.io.File(postings).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
        .map(_.getName.stripPrefix("bucket=").toLong)
      assert(buckets.length > 1, "the vocabulary must spread over >1 shard")
      val probe = spark.read.parquet(postings)
        .filter(col("bucket") === buckets.min)
      probe.collect()
      val selected = probe.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }.sum
      assert(selected == 1,
        s"one-bucket probe must open 1 of ${buckets.length} dirs, opened $selected")
    } finally graft.Scratch.rmTree(out.toFile)
  }

  test("q278: phrase matches are adjacent AND ordered; occurrences counted per position") {
    // bigram stats: (a,b)×3 in docs {1,3}; (b,a)×3 in {1,2,3}; singles
    // (b,b)/(b,c)/(x,y) — so top1=(a,b) (tie broken by t1), top2=(b,a),
    // rare=(b,b). (a,b) vs (b,a) differing is the ORDER sensitivity.
    val docs = Seq((1L, "a b a b c"), (2L, "b a"), (3L, "a b b a"),
      (4L, "x y")).toDF("doc_id", "text")
    val out = java.nio.file.Files.createTempDirectory("graft-pps-spec")
    try {
      val got = TextAnalysis.phraseSearch(docs, s"$out/idx").collect()
        .map(r => r.getAs[String]("query_id") ->
          ((r.getAs[String]("t1"), r.getAs[String]("t2"),
            r.getAs[Long]("n_occ"), r.getAs[Long]("n_docs"),
            r.getAs[Long]("sum_pair_doc_ids")))).toMap
      assert(got("phrase_top1") == (("a", "b", 3L, 2L, 5L)), got("phrase_top1"))
      assert(got("phrase_top2") == (("b", "a", 3L, 3L, 6L)), got("phrase_top2"))
      assert(got("phrase_rare") == (("b", "b", 1L, 1L, 3L)), got("phrase_rare"))
    } finally graft.Scratch.rmTree(out.toFile)
  }

  test("q278: a phrase probe opens only its terms' bucket dirs") {
    val out = java.nio.file.Files.createTempDirectory("graft-pps-spec")
    try {
      TextAnalysis.phraseSearch(TestData.documents(spark, sf), s"$out/idx")
        .collect()
      val postings = s"$out/idx/postings_pos"
      val nBuckets = new java.io.File(postings).listFiles()
        .count(f => f.isDirectory && f.getName.startsWith("bucket="))
      assert(nBuckets > 2, "vocabulary must spread over >2 shards")
      // replay one phrase probe the way servePhraseSearch builds it
      val bg = spark.read.parquet(s"$out/idx/bigrams")
      val top = bg.orderBy(col("n_occ").desc, col("t1"), col("t2")).head()
      val want = Seq(top.getAs[Long]("bucket1"), top.getAs[Long]("bucket2"))
        .distinct
      val probe = spark.read.parquet(postings)
        .filter(col("bucket").isin(want.map(Long.box): _*))
      probe.collect()
      val selected = probe.queryExecution.executedPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.partitionCount
      }.sum
      assert(selected == want.size,
        s"phrase probe must open ${want.size} of $nBuckets dirs, opened $selected")
    } finally graft.Scratch.rmTree(out.toFile)
  }
}
