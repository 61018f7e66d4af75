package graft.operators

import graft.SparkSpec

class SnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def docs = graft.sources.TestData.documents(spark, sf)

  test("diff classifies constructed snapshots exactly") {
    val a = Seq(
      (1L, "same text", "web"),
      (2L, "old text", "web"),
      (3L, "dropped", "book")).toDF("doc_id", "text", "source")
    val b = Seq(
      (1L, "same text", "web"),
      (2L, "new text", "web"),
      (4L, "fresh", "book")).toDF("doc_id", "text", "source")
    val r = Snapshot.diff(a, b).as[(String, String, Long)].collect().toSet
    assert(r == Set(
      ("web", "unchanged", 1L),
      ("web", "changed", 1L),
      ("book", "removed", 1L),
      ("book", "added", 1L)))
  }

  test("derived pseudo-snapshots produce all four statuses and conserve doc counts") {
    val (a, b) = Snapshot.snapshots(docs)
    val byStatus = Snapshot.diff(a, b)
      .groupBy("status").sum("n").as[(String, Long)].collect().toMap
    assert(byStatus.keySet == Set("added", "removed", "changed", "unchanged"),
      s"got $byStatus")
    // every diff row came from exactly one of the two snapshots' doc sets
    assert(byStatus.values.sum ==
      a.select("doc_id").union(b.select("doc_id")).distinct().count())
    // the coin thresholds make unchanged the dominant class (~77% of docs)
    assert(byStatus("unchanged") > byStatus.values.sum / 2)
  }

  test("histogramDrift: identical snapshots score 0, disjoint supports score 2") {
    val a = Seq((1L, "web", 10L), (2L, "web", 250L), (3L, "web", 250L))
      .toDF("doc_id", "source", "n_chars")
    val same = Snapshot.histogramDrift(a, a).select("drift_l1").as[Double].collect()
    assert(same.toSeq == Seq(0.0))
    val b = Seq((4L, "web", 900L), (5L, "web", 1200L))
      .toDF("doc_id", "source", "n_chars")
    val far = Snapshot.histogramDrift(a, b).select("drift_l1").as[Double].collect()
    assert(far.toSeq == Seq(2.0), s"disjoint buckets must give L1 = 2, got ${far.toSeq}")
  }

  test("histogramDrift on derived snapshots: small membership shift, small drift") {
    val (a, b) = Snapshot.snapshots(docs)
    val drifts = Snapshot.histogramDrift(a, b).select("drift_l1").as[Double].collect()
    assert(drifts.nonEmpty)
    // ~5% membership change per side can move an L1 of distributions only so far
    drifts.foreach(d => assert(d >= 0.0 && d < 0.5, s"drift $d out of expected band"))
  }

  test("incrementalRefresh equals the direct aggregate of snapshot B") {
    import org.apache.spark.sql.functions._
    val (a, b) = Snapshot.snapshots(docs)
    val incremental = Snapshot.incrementalRefresh(a, b)
      .as[(String, Long, Long)].collect().toSet
    val direct = b.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long")).as("sum_chars"))
      .as[(String, Long, Long)].collect().toSet
    assert(incremental == direct)
  }

  test("incrementalRefresh delta covers adds, removes, and edits exactly") {
    val a = Seq((1L, "keep", "w"), (2L, "edit me", "w"), (3L, "drop", "w"))
      .toDF("doc_id", "text", "source")
    val b = Seq((1L, "keep", "w"), (2L, "edited!", "w"), (4L, "new doc", "w"))
      .toDF("doc_id", "text", "source")
    val r = Snapshot.incrementalRefresh(a, b)
      .as[(String, Long, Long)].collect().toSeq
    // direct over b: 3 docs, chars 4 + 7 + 7 = 18
    assert(r == Seq(("w", 3L, 18L)))
  }

  test("changed docs are exactly the edited intersection") {
    val (a, b) = Snapshot.snapshots(docs)
    val changed = Snapshot.diff(a, b)
      .filter($"status" === "changed").groupBy().sum("n")
      .as[Long].collect().headOption.getOrElse(0L)
    val expected = a.select("doc_id")
      .join(b.filter($"text".endsWith(" [rev2]")).select("doc_id"), "doc_id")
      .count()
    assert(changed == expected)
  }
}
