package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.TestData

class BucketingSpec extends SparkSpec {

  test("co-bucketed tables join without a shuffle exchange") {
    val orders = TestData.orders(spark, sf)
    val lineitem = TestData.lineitem(spark, sf)
    Bucketing.writeBucketed(orders, "b_orders", "o_orderkey", 4)
    Bucketing.writeBucketed(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "b_lineitem", "o_orderkey", 4)

    val joined = spark.table("b_orders").join(spark.table("b_lineitem"), Seq("o_orderkey"))
      // disable broadcast so the join strategy actually exercises bucketing
      .hint("merge")
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected no shuffle exchange in:\n$plan")
    // and it still computes the right thing
    val expected = orders.join(
      lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), Seq("o_orderkey")).count()
    assert(joined.count() == expected)
  }
}
