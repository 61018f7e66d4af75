package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-generated test tables (`TESTDATA.md`).
  *
  * Plain parquet scans: schema comes from the files, and Catalyst pushes
  * filters/column pruning into the scan (verify with
  * `.explain("formatted")` → `PushedFilters` / `ReadSchema`). At cluster
  * scale these would be partitioned/bucketed external tables; the read API
  * is identical.
  */
object TestData {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = read(spark, dir, "lineitem")
  /** The driver has shipped `ts` as nanos-long, TIMESTAMP, and (currently)
    * TIMESTAMP_NTZ across testdata regenerations — [[EventEncoding]] owns
    * the per-encoding arithmetic. Exposes a microsecond `ts` (Spark's
    * native precision) plus the exact `ts_ns` for integer time arithmetic
    * that must match an oracle reading full nanos.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    EventEncoding.normalize(read(spark, dir, "events"))
  def documents(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")
}
