package graft.plans

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.TestData

class TopKPerKeySpec extends SparkSpec {
  import spark.implicits._

  test("matches the row_number window formulation exactly on real data") {
    val orders = TestData.orders(spark, sf)
    val viaOp = TopK.perKey(orders, Seq("o_custkey"),
      Seq(TopK.asc("o_orderdate"), TopK.asc("o_orderkey")), k = 3)
      .select("o_custkey", "o_orderkey", "rank")
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val viaWindow = orders
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select("o_custkey", "o_orderkey", "rank")
    assert(viaOp.count() > 0)
    assert(viaOp.exceptAll(viaWindow).count() == 0)
    assert(viaWindow.exceptAll(viaOp).count() == 0)
  }

  test("descending order + tie-break, k larger than some groups") {
    val df = Seq(
      ("a", 3), ("a", 9), ("a", 9), ("a", 1),
      ("b", 5)).toDF("key", "v").withColumn("id", monotonically_increasing_id())
    val top = TopK.perKey(df, Seq("key"), Seq(TopK.desc("v"), TopK.asc("id")), k = 2)
      .select("key", "v", "rank").orderBy("key", "rank")
      .as[(String, Int, Int)].collect()
    assert(top.toSeq == Seq(("a", 9, 1), ("a", 9, 2), ("b", 5, 1)))
  }

  test("physical plan contains TopKPerKeyExec, not a Window sort") {
    val orders = TestData.orders(spark, sf)
    val plan = TopK.perKey(orders, Seq("o_custkey"), Seq(TopK.asc("o_orderkey")), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    assert(!plan.contains("Window"))
  }
}
