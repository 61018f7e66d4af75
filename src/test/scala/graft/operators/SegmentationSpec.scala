package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.TestData

/** The window-free NTILE must equal Spark's own global-window ntile —
  * bucket for bucket — while planning WITHOUT the single-partition
  * Exchange the window needs.
  */
class SegmentationSpec extends SparkSpec {

  test("rfmDeciles equals a global-window ntile(10), every customer") {
    val out = Segmentation.rfmDeciles(TestData.orders(spark, sf))
      .select("custkey", "m_decile")
    val w = Window.orderBy(desc("monetary_q"), asc("custkey"))
    val ref = TestData.orders(spark, sf)
      .groupBy(col("o_custkey").as("custkey"))
      .agg(sum(graft.functions.OracleSafe.money(col("o_totalprice")))
        .cast("decimal(18,2)").as("monetary_q"))
      .select(col("custkey"), ntile(10).over(w).as("ref_decile"))
    val diff = out.join(ref, Seq("custkey"))
      .filter(col("m_decile") =!= col("ref_decile"))
    assert(diff.count() === 0)
    assert(out.count() > 0)
  }

  test("ntile arithmetic covers the n < k and n % k != 0 edges") {
    // 7 rows into 10 buckets: ranks 1..7 -> buckets 1..7 (all fat, size 1);
    // 7 rows into 3 buckets: sizes 3,2,2.
    val df = spark.range(1, 8).toDF("o_custkey")
      .withColumn("o_orderdate", to_timestamp(lit("2024-01-01")))
      .withColumn("o_totalprice", col("o_custkey").cast("double"))
    val d10 = Segmentation.rfmDeciles(df, k = 10)
      .select("custkey", "m_decile").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    // spend sorts DESC: custkey 7 is rank 1
    assert(d10 == Map(7L -> 1, 6L -> 2, 5L -> 3, 4L -> 4, 3L -> 5, 2L -> 6, 1L -> 7))
    val d3 = Segmentation.rfmDeciles(df, k = 3)
      .select("custkey", "m_decile").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d3 == Map(7L -> 1, 6L -> 1, 5L -> 1, 4L -> 2, 3L -> 2, 2L -> 3, 1L -> 3))
  }

  test("plan ranks without a Window (data-sized frame never single-partitions)") {
    val plan = Segmentation.rfmDeciles(TestData.orders(spark, sf))
      .queryExecution.executedPlan.toString
    // The 1-row global count legitimately reduces through a SinglePartition
    // exchange (a scalar); what must NOT appear is a Window over the
    // customer frame — rank comes from the zipWithIndex RDD scan instead.
    assert(!plan.contains("Window"),
      s"global window leaked into the plan:\n$plan")
    assert(plan.contains("Scan ExistingRDD"),
      s"expected the surrogate-rank RDD scan in:\n$plan")
  }

  test("decayedValueRank: exact halving weights, horizon cutoff, id tie-break") {
    import spark.implicits._
    val day = 86400000L
    // user 1: $1 on the last day (weight 2^15); user 2: $2 the day
    // before (weight 2^14) — scores tie EXACTLY (100·2^15 == 200·2^14),
    // so user 1 must rank first on the id tie-break. user 3's only event
    // is past the 16-day horizon: fully decayed, absent from the output.
    val ev = Seq(
      (1L, 1L, "v", 20L * day, 1.0),
      (2L, 2L, "v", 19L * day, 2.0),
      (3L, 3L, "v", 2L * day, 10000.0))
      .toDF("event_id", "user_id", "event_type", "ms", "value")
      .selectExpr("event_id", "user_id", "event_type",
        "ms * 1000000 AS ts_ns", "value")
    val r = Segmentation.decayedValueRank(ev).collect()
    assert(r.map(_.getAs[Long]("user_id")).toSeq == Seq(1L, 2L))
    assert(r.forall(_.getAs[Long]("decayed_scaled") == 100L * (1L << 15)))
    assert(r.map(x => x.getAs[Long]("user_id") -> x.getAs[Long]("raw_cents"))
      .toMap == Map(1L -> 100L, 2L -> 200L))
  }
}
