package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SurrogateKeysSpec extends SparkSpec {
  import spark.implicits._

  test("dense keys are contiguous, 1-based, ordered by the natural key") {
    val df = Seq("m", "a", "z", "k", "b").toDF("name")
    val keyed = SurrogateKeys.dense(df, "key", col("name"))
      .orderBy("key").as[(Long, String)].collect()
    assert(keyed.toSeq == Seq((1L, "a"), (2L, "b"), (3L, "k"), (4L, "m"), (5L, "z")))
  }

  test("deterministic across partitioning layouts") {
    val data = (1 to 500).map(i => ((i * 7919) % 501).toString)
    val one = SurrogateKeys.dense(data.toDF("v").repartition(1), "k", col("v")).collect().toSet
    val many = SurrogateKeys.dense(data.toDF("v").repartition(7), "k", col("v")).collect().toSet
    assert(one == many)
  }

  test("matches ROW_NUMBER() OVER (ORDER BY key) exactly") {
    val df = (1 to 100).map(i => (i * 37) % 101).distinct.toDF("v")
    val dense = SurrogateKeys.dense(df, "k", col("v"))
    val window = df.select(
      org.apache.spark.sql.functions.row_number()
        .over(org.apache.spark.sql.expressions.Window.orderBy("v")).cast("long").as("k"),
      col("v"))
    assert(dense.select("k", "v").collect().toSet == window.collect().toSet)
  }

  test("empty input → empty output with the key column") {
    val df = Seq.empty[String].toDF("v")
    val keyed = SurrogateKeys.dense(df, "k", col("v"))
    assert(keyed.columns.toSeq == Seq("k", "v") && keyed.count() == 0)
  }
}
