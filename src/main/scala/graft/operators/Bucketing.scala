package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed tables for co-located joins (SURVEY.md §"Partitioning &
  * shuffle"): writing both sides of a recurring join bucketed by the join
  * key with the same bucket count lets Spark join them with NO shuffle
  * exchange — at 100 TB the dominant cost of a fact-to-fact join simply
  * disappears for every downstream query against the bucketed layout.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    // a previous SESSION's files can survive with no catalog entry — then
    // Overwrite refuses with LOCATION_ALREADY_EXISTS; clear the location
    val loc = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }
}
