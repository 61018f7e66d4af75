package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting — for when AQE's runtime skew handling
  * isn't available (non-AQE paths, stateful streaming aggregations) or a
  * key is so hot it overwhelms a single task anyway.
  *
  * Correctness: salting only rewrites WHERE rows meet, never what they
  * join/aggregate to — verified equal to the unsalted operators in
  * SkewSpec.
  */
object Skew {

  /** Two-phase aggregate: partial sums on (key, salt), final on key.
    * Deterministic salt from secondary columns, not rand() — reruns and
    * retries land rows in the same salt bucket.
    */
  def saltedSum(df: DataFrame, key: String, value: Column, saltFrom: Column,
      buckets: Int = 16): DataFrame =
    df.withColumn("_salt", pmod(hash(saltFrom), lit(buckets)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(value).as("_partial"))
      .groupBy(col(key))
      .agg(sum(col("_partial")).as("total"))

  /** Skewed-side salted broadcast-free join: the big (skewed) side gets a
    * deterministic salt in [0, buckets); the small side is replicated once
    * per salt value. The join key becomes (key, salt) — a hot key now
    * spreads over `buckets` tasks.
    */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, saltFrom: Column,
      buckets: Int = 16): DataFrame = {
    val spark = big.sparkSession
    val salts = spark.range(buckets).select(col("id").cast("int").as("_salt"))
    val saltedBig = big.withColumn("_salt", pmod(hash(saltFrom), lit(buckets)).cast("int"))
    val replicatedSmall = small.crossJoin(broadcast(salts))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
