package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.OracleSafe

/** Schema evolution across ingest batches — the lake reality the
  * reference's fixed-DDL loaders never meet: a long-lived dataset's
  * early files lack columns later batches carry, and readers must union
  * the schemas (old rows null-filled) instead of failing or silently
  * projecting to whichever file's footer got sampled first.
  *
  * Scale note: `mergeSchema` is a FOOTER-only pass (one small read per
  * file, no row data), but at millions of files even footers cost a
  * listing storm — production lakes push the merged schema into a table
  * format's metadata instead. The read path here is exactly what those
  * formats execute underneath; the audit proves the null-fill semantics.
  */
object SchemaEvolution {

  /** Stage the events table as two parquet batches with drifted schemas:
    * v1 (even event ids) carries the original three columns; v2 (odd
    * ids) adds a derived `channel` column. Both carry their batch id in
    * a `src` column so the read-back audit can attribute rows.
    */
  def stageDriftedBatches(events: DataFrame, outDir: String): Unit = {
    val base = events.select(col("event_id"), col("event_type"),
      OracleSafe.quant(col("value"), 100).as("cents"))
    base.filter(col("event_id") % 2 === 0)
      .withColumn("src", lit("v1"))
      .write.mode("overwrite").parquet(s"$outDir/batch_v1")
    base.filter(col("event_id") % 2 =!= 0)
      .withColumn("src", lit("v2"))
      .withColumn("channel",
        concat(col("event_type"), lit("_"), (col("event_id") % 3).cast("string")))
      .write.mode("overwrite").parquet(s"$outDir/batch_v2")
  }

  /** Merged-schema read-back audit: per batch, row count, how many rows
    * carry the evolved column vs NULL-filled, and the cent-exact total —
    * proving the union projected old rows correctly instead of dropping
    * either the rows or the new column.
    */
  def evolvedRead(spark: SparkSession, outDir: String): DataFrame =
    spark.read.option("mergeSchema", "true")
      .parquet(s"$outDir/batch_v1", s"$outDir/batch_v2")
      .groupBy("src")
      .agg(count(lit(1)).as("n"),
        sum(when(col("channel").isNull, 1L).otherwise(0L)).as("n_channel_null"),
        countDistinct(col("channel")).as("n_channels"),
        sum(col("cents")).as("total_cents"))
      .orderBy("src")

  /** DuckDB twin of [[stageDriftedBatches]] + [[evolvedRead]], computed
    * from the parquet events table with the same split and derivation;
    * embed after `WITH ` and select from `schema_evolution`.
    */
  def evolvedReadSql(): String =
    s"""se_base AS (
       |  SELECT event_id, event_type,
       |         ${OracleSafe.quantSql("value", 100)} AS cents
       |  FROM events),
       |schema_evolution AS (
       |  SELECT 'v1' AS src, COUNT(*) AS n, COUNT(*) AS n_channel_null,
       |         CAST(0 AS BIGINT) AS n_channels,
       |         CAST(SUM(cents) AS BIGINT) AS total_cents
       |  FROM se_base WHERE event_id % 2 = 0
       |  UNION ALL
       |  SELECT 'v2' AS src, COUNT(*) AS n, CAST(0 AS BIGINT) AS n_channel_null,
       |         CAST(COUNT(DISTINCT event_type || '_' ||
       |                    CAST(event_id % 3 AS VARCHAR)) AS BIGINT) AS n_channels,
       |         CAST(SUM(cents) AS BIGINT) AS total_cents
       |  FROM se_base WHERE event_id % 2 <> 0)""".stripMargin
}
