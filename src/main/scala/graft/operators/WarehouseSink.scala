package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Warehouse persistence (SURVEY.md S4 — replaces the reference's
  * `to_sql(..., if_exists='append', fast_executemany=True)` bulk loads,
  * `etl_pipeline/etl.py:287-304,386`).
  *
  * Dimensions are single parquet datasets; the fact is PARTITIONED BY the
  * date key's year-month prefix so time-range dashboard queries prune
  * partitions at the file-listing level — at 100 TB that's the difference
  * between scanning a month and scanning the lake. The IDENTITY read-back
  * round-trip of the reference (etl.py:315-326) does not exist here: keys
  * were computed in the DAG before the write.
  */
object WarehouseSink {

  def write(w: BankEtl.Warehouse, outDir: String): Unit = {
    def dim(df: DataFrame, name: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name")
    dim(w.dimDate, "Dim_Date")
    dim(w.dimCustomer, "Dim_Customer")
    dim(w.dimAccount, "Dim_Account")
    dim(w.dimMerchant, "Dim_Merchant")
    dim(w.dimLocation, "Dim_Location")
    w.fact
      .withColumn("ym", (col("Date_Key") / 10000).cast("int")) // yyyyMM prefix
      .write.mode(SaveMode.Overwrite)
      .partitionBy("ym")
      .parquet(s"$outDir/Fact_Spending")
  }
}
