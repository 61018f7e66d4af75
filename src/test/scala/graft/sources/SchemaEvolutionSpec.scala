package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Schema-evolution read: the merged schema carries the evolved column,
  * old rows null-fill, and no rows or values are lost in the union.
  */
class SchemaEvolutionSpec extends SparkSpec {
  import spark.implicits._

  private def events(n: Int) =
    (1 to n).map(i => (i.toLong, if (i % 2 == 0) "click" else "view",
      i * 2.0, java.sql.Timestamp.valueOf("2024-03-01 00:00:00")))
      .toDF("event_id", "event_type", "value", "ts")

  test("merged read unions the schemas; v1 rows null-fill the new column") {
    val out = graft.Scratch.dir("se-spec").toString
    SchemaEvolution.stageDriftedBatches(events(20), out)
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$out/batch_v1", s"$out/batch_v2")
    assert(merged.columns.contains("channel"),
      "the evolved column must survive the union")
    val r = SchemaEvolution.evolvedRead(spark, out).collect()
      .map(x => x.getAs[String]("src") -> x).toMap
    assert(r("v1").getAs[Long]("n") == 10L)
    assert(r("v1").getAs[Long]("n_channel_null") == 10L,
      "every pre-evolution row must null-fill, not drop")
    assert(r("v1").getAs[Long]("n_channels") == 0L)
    assert(r("v2").getAs[Long]("n") == 10L)
    assert(r("v2").getAs[Long]("n_channel_null") == 0L)
    assert(r("v2").getAs[Long]("n_channels") > 0L)
    // no value lost across the union: cents partition exactly
    val expect = events(20)
      .agg(sum(graft.functions.OracleSafe.quant(col("value"), 100)))
      .head().getLong(0)
    assert(r("v1").getAs[Long]("total_cents")
      + r("v2").getAs[Long]("total_cents") == expect)
  }
}
