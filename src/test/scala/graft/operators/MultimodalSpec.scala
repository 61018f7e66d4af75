package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.TestData

class MultimodalSpec extends SparkSpec {

  test("mapPartitions decode path matches the pure-expression formula") {
    val docs = TestData.documents(spark, sf)
    val viaPartitions = Multimodal.documentMedia(docs)
    // same fake-decode arithmetic as a column expression
    val viaExpr = docs.select(
      col("doc_id"),
      length(col("text").cast("binary")).as("n_bytes"),
      (lit(1) + expr("CAST(conv(substring(md5(text), 1, 6), 16, 10) AS BIGINT) % 1024"))
        .cast("int").as("width"),
      (lit(1) + expr("CAST(conv(substring(md5(text), 7, 6), 16, 10) AS BIGINT) % 768"))
        .cast("int").as("height"),
      (lit(1) + length(col("text").cast("binary")) % 30).as("frames"))
    assert(viaPartitions.exceptAll(viaExpr).count() == 0)
    assert(viaExpr.exceptAll(viaPartitions).count() == 0)
  }

  test("media table carries a real binary column") {
    val m = Multimodal.mediaTable(TestData.documents(spark, sf))
    val first = m.head()
    assert(first.content.length > 0)
    assert(first.media_type == "image/fake")
  }
}
