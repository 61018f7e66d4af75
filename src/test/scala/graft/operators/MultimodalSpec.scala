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

  test("frame sampling: frame 0 always present, <=4 frames, all within bounds") {
    import spark.implicits._
    val docs = TestData.documents(spark, sf)
    val frames = Multimodal.documentFrames(docs)
      .groupBy("doc_id").agg(
        collect_list(col("frame_idx")).as("idxs"))
      .join(Multimodal.documentMedia(docs).select("doc_id", "frames"), Seq("doc_id"))
      .as[(Long, Seq[Int], Int)].collect()
    assert(frames.nonEmpty)
    frames.foreach { case (id, idxs, total) =>
      assert(idxs.contains(0), s"doc $id must sample frame 0")
      assert(idxs.length <= 4, s"doc $id sampled ${idxs.length} > 4 frames")
      assert(idxs.forall(i => i >= 0 && i < total), s"doc $id frame out of bounds")
      assert(idxs.distinct.length == idxs.length, s"doc $id duplicate frames")
    }
  }

  test("resize plan: longest edge lands exactly on target, nothing exceeds it") {
    import spark.implicits._
    val meta = Multimodal.documentMedia(TestData.documents(spark, sf))
    val r = Multimodal.resizePlan(meta)
      .as[(Long, Int, Int, Int, Int)].collect()
    r.foreach { case (id, w, h, ow, oh) =>
      assert(math.max(ow, oh) == 224, s"doc $id longest edge ${math.max(ow, oh)} != 224")
      assert(ow <= 224 && oh <= 224 && ow >= 1 && oh >= 1)
      // aspect ratio preserved within integer truncation: ow/oh within one
      // step of w/h
      assert(math.abs(ow.toDouble / oh - w.toDouble / h) <
        math.max(w.toDouble / h, 1.0), s"doc $id aspect drift")
    }
  }
}
