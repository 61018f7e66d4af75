package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed tables for co-located joins (SURVEY.md §"Partitioning &
  * shuffle"): writing both sides of a recurring join bucketed by the join
  * key with the same bucket count lets Spark join them with NO shuffle
  * exchange — at 100 TB the dominant cost of a fact-to-fact join simply
  * disappears for every downstream query against the bucketed layout.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
}
