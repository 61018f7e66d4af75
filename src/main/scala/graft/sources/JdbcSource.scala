package graft.sources

import java.util.Properties

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Optional JDBC source (SURVEY.md S1 — the reference extracts with
  * `SELECT *` over ODBC, `etl_pipeline/etl.py:48-50`). Exercised
  * end-to-end against an embedded Derby database in JdbcRoundTripSpec;
  * the parquet readers in [[TestData]] are the primary source.
  *
  * Scale notes baked into the API: always read with a partition column +
  * bounds (otherwise the whole table arrives through ONE connection —
  * exactly the reference's single-process extraction bottleneck), and push
  * the projection/predicate down as a dbtable subquery.
  */
object JdbcSource {

  def readPartitioned(
      spark: SparkSession,
      url: String,
      table: String,
      partitionColumn: String,
      lowerBound: Long,
      upperBound: Long,
      numPartitions: Int,
      props: Properties = new Properties()): DataFrame =
    spark.read
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound.toString)
      .option("upperBound", upperBound.toString)
      .option("numPartitions", numPartitions.toString)
      .format("jdbc")
      .load()
}
