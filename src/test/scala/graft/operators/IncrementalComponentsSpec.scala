package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q257: incremental component maintenance — the delta merge arithmetic
  * on a hand-built graph, and updated == rebuilt on the real corpus.
  */
class IncrementalComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def pairs(ps: (Long, Long)*) =
    ps.toDF("doc_a", "doc_b")

  test("a delta edge merges two base components onto the global min") {
    val out = java.nio.file.Files.createTempDirectory("graft-icc-spec")
    try {
      // base: {1,2} and {3,4} and {5,6}; delta: 2-3 merges the first two,
      // 10-11 is a brand-new component the base never saw
      val r = Dedup.incrementalComponentsFromPairs(
          pairs(1L -> 2L, 3L -> 4L, 5L -> 6L),
          pairs(2L -> 3L, 10L -> 11L), out.toString)
        .collect().map(x => (x.getLong(0), x.getLong(1), x.getInt(2))).toSet
      assert(r == Set(
        (1L, 1L, 1), (2L, 1L, 0), (3L, 1L, 0), (4L, 1L, 0),
        (5L, 5L, 1), (6L, 5L, 0),
        (10L, 10L, 1), (11L, 10L, 0)))
      // the persisted artifact still holds the PRE-delta labels: the
      // delta was applied to the loaded frame, not by re-propagation
      val persisted = spark.read.parquet(s"$out/labels")
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(persisted == Set(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L,
        5L -> 5L, 6L -> 5L))
    } finally graft.Scratch.rmTree(out.toFile)
  }

  test("a delta chain through a new vertex merges three components") {
    val out = java.nio.file.Files.createTempDirectory("graft-icc-spec")
    try {
      // 7 is new and bridges {1,2} and {3,4}; an intra-component delta
      // edge (5,6) is a no-op
      val r = Dedup.incrementalComponentsFromPairs(
          pairs(1L -> 2L, 3L -> 4L, 5L -> 6L),
          pairs(2L -> 7L, 7L -> 4L, 5L -> 6L), out.toString)
        .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      assert(r == Set(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 7L -> 1L,
        5L -> 5L, 6L -> 5L))
    } finally graft.Scratch.rmTree(out.toFile)
  }

  test("updated equals rebuilt on the real corpus") {
    val out = java.nio.file.Files.createTempDirectory("graft-icc-spec")
    try {
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      val updated = Dedup.incrementalComponents(docs, out.toString)
        .collect().map(_.toSeq).toSet
      val rebuilt = Dedup.dedupClusters(docs).orderBy("doc_id")
        .collect().map(_.toSeq).toSet
      assert(updated == rebuilt)
      assert(updated.nonEmpty)
    } finally graft.Scratch.rmTree(out.toFile)
  }
}
