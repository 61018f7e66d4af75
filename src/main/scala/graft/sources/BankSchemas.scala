package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

/** Explicit schemas for the bank source and warehouse tables — the engine's
  * equivalent of the reference DDL (`data_source/schema.sql:17-50` source,
  * `:71-135` warehouse). Spark doesn't enforce PK/FK constraints, so
  * [[conforms]] + [[graft.operators.DataQuality]] carry the contract
  * instead (SURVEY.md S5).
  *
  * Timestamps are TIMESTAMP_NTZ: the testdata parquet carries
  * wall-clock (not UTC-adjusted) timestamps, matching the reference's
  * timezone-less SQL Server DATETIME.
  */
object BankSchemas {

  val customers: StructType = StructType(Seq(
    StructField("CustomerID", LongType, nullable = false),
    StructField("FirstName", StringType),
    StructField("LastName", StringType),
    StructField("BirthDate", DateType),
    StructField("Gender", StringType),
    StructField("City", StringType),
    StructField("Country", StringType)))

  val accounts: StructType = StructType(Seq(
    StructField("AccountID", LongType, nullable = false),
    StructField("CustomerID", LongType, nullable = false),
    StructField("AccountType", StringType),
    StructField("OpenDate", TimestampNTZType)))

  val transactions: StructType = StructType(Seq(
    StructField("TransactionID", LongType, nullable = false),
    StructField("AccountID", LongType, nullable = false),
    StructField("MerchantName", StringType),
    StructField("Amount", DecimalType(18, 2)),
    StructField("TransactionTimestamp", TimestampNTZType),
    StructField("TransactionCountry", StringType),
    StructField("BeneficiaryName", StringType),
    StructField("TransactionDescription", StringType)))

  val mccMapping: StructType = StructType(Seq(
    StructField("MerchantName", StringType, nullable = false),
    StructField("Category", StringType, nullable = false)))

  val factSpending: StructType = StructType(Seq(
    // BIGINT IDENTITY PK (schema.sql:116), assigned in-DAG by SurrogateKeys
    StructField("Transaction_Key", LongType, nullable = false),
    StructField("Date_Key", IntegerType, nullable = false),
    StructField("Customer_Key", LongType, nullable = false),
    StructField("Account_Key", LongType, nullable = false),
    StructField("Merchant_Key", LongType, nullable = false),
    StructField("Location_Key", LongType, nullable = false),
    StructField("Amount_Spent", DecimalType(18, 2)),
    StructField("Transaction_Count", IntegerType, nullable = false)))

  /** Structural conformance: same column names and types in order
    * (nullability is advisory, as in Spark generally).
    */
  def conforms(df: DataFrame, schema: StructType): Boolean =
    df.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      schema.fields.map(f => (f.name, f.dataType)).toSeq
}
