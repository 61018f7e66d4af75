package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.TestData

class SkewSpec extends SparkSpec {

  test("salted two-phase sum equals the plain aggregate") {
    val li = TestData.lineitem(spark, sf)
    val plain = li.groupBy("l_suppkey").agg(sum(col("l_quantity")).as("total"))
    val salted = Skew.saltedSum(li, "l_suppkey", col("l_quantity"), col("l_orderkey"))
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }

  test("AQE splits a deliberately skewed join partition at runtime") {
    // The no-code-change alternative to manual salting: AQE's skew-join
    // rule re-plans the sort-merge join at runtime, splitting the
    // oversized partition into advisory-sized slices. Thresholds are
    // lowered to make a 200k-row local corpus register as skewed; at
    // cluster scale the defaults (256 MB / factor 5) do the same job.
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
    val saved = keys.map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      // 99.5% of 200k rows share key 0: one shuffle partition dwarfs the rest
      val left = spark.range(200000L).select(
        when(col("id") % 200 === 0, col("id")).otherwise(lit(0L)).as("k"),
        col("id").as("payload"))
      val right = spark.range(1000L).select(col("id").as("k"), (col("id") * 2).as("v"))
      val joined = left.join(right, Seq("k"))
      // collect() (not count()) so THIS frame's adaptive plan executes —
      // count() spawns its own QueryExecution and leaves this one unrun
      // k=0: 199,000 hot rows + id=0 itself; k in {200,400,600,800}: 4 more
      assert(joined.collect().length == 199005)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), plan.take(500))
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join in:\n$plan")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _))
    }
  }

  test("salted join equals the plain join") {
    val li = TestData.lineitem(spark, sf).select("l_orderkey", "l_suppkey", "l_quantity")
    val sup = TestData.supplier(spark, sf).withColumnRenamed("s_suppkey", "l_suppkey")
    val plain = li.join(sup, Seq("l_suppkey")).select("l_orderkey", "l_suppkey", "s_name")
    val salted = Skew.saltedJoin(li, sup, "l_suppkey", col("l_orderkey"))
      .select("l_orderkey", "l_suppkey", "s_name")
    assert(salted.exceptAll(plain).count() == 0)
    assert(plain.exceptAll(salted).count() == 0)
  }
}
