package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q332 — field-id schema evolution: renames resolve by id, dropped ids
  * never resurrect, pre-add batches null-fill, and the failure modes of
  * name-based merging are demonstrated against the same files.
  */
class FieldIdTableSpec extends SparkSpec {
  import spark.implicits._

  test("q332 rename resolves by id; re-added name does not resurrect the dead column") {
    val out = java.nio.file.Files.createTempDirectory("graft-fid")
    try {
      val tbl = s"$out/tbl"
      FieldIdTable.appendWithSchema(
        Seq((1L, "x", 10L)).toDF("event_id", "etype", "val_cents"),
        tbl, 1L, Seq(1 -> "event_id", 2 -> "etype", 3 -> "val_cents"))
      // v2: rename ids 2,3; add channel as id 4
      FieldIdTable.appendWithSchema(
        Seq((2L, "y", 20L, "ch_old")).toDF(
          "event_id", "event_type", "cents", "channel"),
        tbl, 2L, Seq(1 -> "event_id", 2 -> "event_type", 3 -> "cents",
          4 -> "channel"))
      val atV2 = FieldIdTable.readFieldTable(spark, tbl, 2L)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          Option(r.getString(3)))).toSet
      // rename safety: v1's row surfaces under the NEW names with its data
      assert(atV2 == Set((1L, "x", 10L, None), (2L, "y", 20L, Some("ch_old"))))
      // v3: drop id 4, re-add channel as id 5 — same name, fresh id
      FieldIdTable.appendWithSchema(
        Seq((3L, "z", 30L, "ch_new")).toDF(
          "event_id", "event_type", "cents", "channel"),
        tbl, 3L, Seq(1 -> "event_id", 2 -> "event_type", 3 -> "cents",
          5 -> "channel"))
      val atV3 = FieldIdTable.readFieldTable(spark, tbl, 3L)
        .collect().map(r => (r.getLong(0), Option(r.getString(3)))).toMap
      // no resurrection: v2's file physically carries channel='ch_old',
      // but id 4 is dead — the v2 row must read NULL under id 5
      assert(atV3 == Map(1L -> None, 2L -> None, 3L -> Some("ch_new")))
      // the contrast: a name-based mergeSchema read of the same files
      // DOES resurrect the dead value — exactly the bug field ids fix
      val nameBased = spark.read.option("mergeSchema", "true")
        .parquet(s"$tbl/data/v2", s"$tbl/data/v3")
        .filter(col("event_id") === 2L)
        .select("channel").collect().head.getString(0)
      assert(nameBased == "ch_old",
        "fixture must exhibit the resurrection mergeSchema is blind to")
      // time travel: the v2 read is unchanged by v3's evolution
      assert(FieldIdTable.readFieldTable(spark, tbl, 2L).count() == 2L)
    } finally graft.Scratch.rmTree(out.toFile)
  }

  test("q332 appendWithSchema rejects a batch whose columns drift from the declared mapping") {
    val out = java.nio.file.Files.createTempDirectory("graft-fid2")
    try {
      val e = intercept[IllegalArgumentException] {
        FieldIdTable.appendWithSchema(
          Seq((1L, "x")).toDF("event_id", "wrong_name"),
          s"$out/tbl", 1L, Seq(1 -> "event_id", 2 -> "etype"))
      }
      assert(e.getMessage.contains("must match mapping"))
    } finally graft.Scratch.rmTree(out.toFile)
  }
}
