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
