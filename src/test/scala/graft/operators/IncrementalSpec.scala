package graft.operators

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class IncrementalSpec extends SparkSpec {
  import spark.implicits._

  private def orders(rows: (Long, Double, String)*): DataFrame =
    rows.toDF("o_orderkey", "o_totalprice", "d")
      .select(col("o_orderkey"), col("o_totalprice"),
        col("d").cast("timestamp_ntz").as("o_orderdate"))

  test("merged incremental aggregate equals the full recompute") {
    val o = orders(
      (1L, 10.50, "1998-12-31 23:59:59"),  // base, Dec 1998
      (2L, 20.25, "1999-01-01 00:00:00"),  // boundary row → delta, Jan 1999
      (3L, 5.00, "1999-01-15 00:00:00"),   // delta, same month
      (4L, 7.75, "1998-12-01 00:00:00"))   // base, Dec 1998
    val merged = Incremental.monthlyOrdersMerged(o, "1999-01-01")
      .orderBy("ym").as[(Int, Long, Double)].collect()
    assert(merged.toSeq == Seq((199812, 2L, 18.25), (199901, 2L, 25.25)))
  }

  test("a month straddled by the split merges its base and delta halves") {
    val o = orders(
      (1L, 1.00, "1999-01-02 00:00:00"),
      (2L, 2.00, "1999-01-20 00:00:00"))
    val merged = Incremental.monthlyOrdersMerged(o, "1999-01-10")
      .as[(Int, Long, Double)].collect()
    assert(merged.toSeq == Seq((199901, 2L, 3.00)))
  }

  test("incremental == full on real data for any split point") {
    val o = graft.sources.TestData.orders(spark, sf)
    val full = Incremental.monthlyOrdersMerged(o, "1990-01-01") // all-delta
    for (split <- Seq("1996-06-15", "1999-01-01", "2005-01-01")) {
      val m = Incremental.monthlyOrdersMerged(o, split)
      assert(m.exceptAll(full).count() == 0 && full.exceptAll(m).count() == 0,
        s"split $split diverges from full recompute")
    }
  }
}
