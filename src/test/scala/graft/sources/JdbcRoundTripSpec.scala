package graft.sources

import java.sql.DriverManager

import graft.SparkSpec
import graft.operators.{BankEtl, WarehouseSink}
import org.apache.spark.sql.SaveMode

/** End-to-end exercise of the JDBC surface (SURVEY.md S1b source +
  * S4 write-back sink) against an embedded Derby database — the same
  * engine Spark itself ships for its Hive metastore, so it is on the
  * unmanaged classpath with zero extra dependencies. This is the
  * harness-runnable stand-in for the reference's SQL Server loads
  * (`etl_pipeline/etl.py:48-50,287-304,386`): the writer is the stock
  * Spark JDBC relation, so everything below (DDL mapping, batched
  * inserts, partitioned parallel reads) is exactly what a real
  * warehouse deployment runs.
  */
class JdbcRoundTripSpec extends SparkSpec {

  private val db = "memory:graftwh"
  private val url = s"jdbc:derby:$db;create=true"

  test("S1b+S4: star schema JDBC write-back round-trips through Derby") {
    val w = BankEtl.buildCached(spark, sf)
    val cfg = WarehouseSink.JdbcSinkConfig(url,
      batchSize = 500, numPartitions = Some(2))
    try {
      WarehouseSink.writeJdbc(w, cfg, SaveMode.Append)

      // Every table arrived with the full row count.
      w.tables.foreach { case (table, df) =>
        val back = spark.read.format("jdbc")
          .option("url", url).option("dbtable", table).load()
        assert(back.count() == df.count(), s"$table row count")
      }

      // Fact round-trips VALUE-exact through the S1b partitioned read path
      // (numeric columns only, so except() is a strict equality check).
      val bounds = w.fact.agg(
        org.apache.spark.sql.functions.min("Transaction_Key"),
        org.apache.spark.sql.functions.max("Transaction_Key")).head()
      val factBack = JdbcSource.readPartitioned(spark, url, "Fact_Spending",
        partitionColumn = "Transaction_Key",
        lowerBound = bounds.getLong(0), upperBound = bounds.getLong(1) + 1,
        numPartitions = 4)
      assert(factBack.rdd.getNumPartitions == 4,
        "partitioned read must fan out over 4 connections")
      val orig = w.fact.select(factBack.columns.map(org.apache.spark.sql.functions.col): _*)
      assert(factBack.except(orig).isEmpty && orig.except(factBack).isEmpty,
        "fact values must round-trip exactly")

      // A string-bearing dim survives the CLOB mapping byte-for-byte
      // (Vietnamese labels included).
      val merchBack = spark.read.format("jdbc")
        .option("url", url).option("dbtable", "Dim_Merchant").load()
        .select(w.dimMerchant.columns.map(org.apache.spark.sql.functions.col): _*)
      assert(merchBack.except(w.dimMerchant).isEmpty &&
        w.dimMerchant.except(merchBack).isEmpty,
        "Dim_Merchant strings must round-trip exactly")

      // Append is append, not replace: a second fact load doubles the rows.
      w.fact.limit(5).write.format("jdbc").mode(SaveMode.Append)
        .options(WarehouseSink.jdbcOptions(cfg, "Dim_Location")
          .updated("dbtable", "Fact_Spending")).save()
      val after = spark.read.format("jdbc")
        .option("url", url).option("dbtable", "Fact_Spending").load().count()
      assert(after == w.fact.count() + 5, "append mode must not truncate")
    } finally {
      // In-memory Derby survives the connection; drop it so reruns in the
      // same JVM start clean.
      try DriverManager.getConnection(s"jdbc:derby:$db;drop=true")
      catch { case e: java.sql.SQLException if e.getSQLState == "08006" => () }
    }
  }
}
