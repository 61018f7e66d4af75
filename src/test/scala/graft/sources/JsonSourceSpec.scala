package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** JSONL ingest: lossless round trip for parseable rows, exact
  * quarantine accounting for malformed ones, and the two-pass design
  * (no `_corrupt_record` reference anywhere).
  */
class JsonSourceSpec extends SparkSpec {
  import spark.implicits._

  private def events(n: Int) =
    (1 to n).map(i => (i.toLong, if (i % 2 == 0) "click" else "view",
      i * 1.25, java.sql.Timestamp.valueOf(f"2024-01-${i % 28 + 1}%02d 10:00:00")))
      .toDF("event_id", "event_type", "value", "ts")

  test("zero corruption: every row survives, quarantine is 0, cents exact") {
    val out = graft.Scratch.dir("json-spec-clean").toString
    JsonSource.stageJsonl(events(40), out, corruptMod = 1000000007L)
    val r = JsonSource.ingestWithQuarantine(spark, out).collect()
      .map(x => x.getAs[String]("event_type") -> x).toMap
    assert(r("zz_quarantined").getAs[Long]("n") == 0L)
    assert(r("click").getAs[Long]("n") == 20L && r("view").getAs[Long]("n") == 20L)
    // cents survive the serialize -> parse round trip exactly
    val expect = events(40)
      .agg(sum(graft.functions.OracleSafe.quant(col("value"), 100))).head().getLong(0)
    assert(r("click").getAs[Long]("total_cents")
      + r("view").getAs[Long]("total_cents") == expect)
  }

  test("keyed corruption quarantines exactly the mangled lines") {
    val out = graft.Scratch.dir("json-spec-corrupt").toString
    JsonSource.stageJsonl(events(50), out, corruptMod = 10L)
    val r = JsonSource.ingestWithQuarantine(spark, out).collect()
      .map(x => x.getAs[String]("event_type") -> x).toMap
    assert(r("zz_quarantined").getAs[Long]("n") == 5L, "ids 10,20,30,40,50")
    assert(r.isDefinedAt("zz_quarantined") &&
      r("zz_quarantined").isNullAt(r("zz_quarantined").fieldIndex("total_cents")))
    // the five corrupted ids are all even -> clicks lose exactly 5 rows
    assert(r("click").getAs[Long]("n") == 20L)
    assert(r("view").getAs[Long]("n") == 25L)
  }

  test("a syntactically valid line with a wrong type is also quarantined") {
    val out = graft.Scratch.dir("json-spec-types")
    java.nio.file.Files.write(out.resolve("part.json"),
      java.util.Arrays.asList(
        """{"event_id":1,"event_type":"click","value":2.5,"us":5}""",
        """{"event_id":"not a number","event_type":"click","value":1.0,"us":6}""",
        """not json at all"""))
    val r = JsonSource.ingestWithQuarantine(spark, out.toString).collect()
      .map(x => x.getAs[String]("event_type") -> x).toMap
    assert(r("click").getAs[Long]("n") == 1L)
    assert(r("zz_quarantined").getAs[Long]("n") == 2L,
      "type-mismatch rows must quarantine alongside unparseable ones")
  }
}
