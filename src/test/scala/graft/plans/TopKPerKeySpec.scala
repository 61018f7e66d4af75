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

  test("optimizer rule rewrites window+filter top-k automatically") {
    val orders = TestData.orders(spark, sf)
    val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    val viaWindow = orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2)
    val plan = viaWindow.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"rule did not fire:\n$plan")
    assert(!plan.contains("Window"), s"window still present:\n$plan")
    // expected via rank() — the rule only matches row_number, so this stays
    // a real Window; with a unique ORDER BY, rank == row_number
    val expected = orders
      .withColumn("rn2", rank().over(w)).filter(col("rn2") <= 2)
      .select(col("o_orderkey"), col("rn2").cast("int").as("rn"))
    assert(viaWindow.select("o_orderkey", "rn").exceptAll(expected).count() == 0)
    assert(expected.exceptAll(viaWindow.select("o_orderkey", "rn")).count() == 0)
  }

  test("rule skips GLOBAL top-k (empty partitionBy) — Spark's own path handles it") {
    val orders = TestData.orders(spark, sf)
    val w = Window.orderBy("o_orderkey")
    val df = orders.withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
    assert(!df.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(df.count() == 3)
  }

  test("rule leaves non-matching windows alone (rank projected without filter)") {
    val orders = TestData.orders(spark, sf)
    val w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    val df = orders.withColumn("rn", row_number().over(w)) // no filter → no rewrite
    assert(df.queryExecution.executedPlan.toString.contains("Window"))
    assert(df.count() == orders.count())
  }

  test("physical plan contains TopKPerKeyExec, not a Window sort") {
    val orders = TestData.orders(spark, sf)
    val plan = TopK.perKey(orders, Seq("o_custkey"), Seq(TopK.asc("o_orderkey")), 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
    assert(!plan.contains("Window"))
  }
}
