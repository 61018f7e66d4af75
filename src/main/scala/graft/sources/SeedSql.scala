package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Reader for the reference's seed scripts (the `data_source/tbl_*` SQL
  * files, e.g. `tbl_Customers/tbl_Customers.sql:1`): one-row T-SQL INSERT
  * statements, parsed as a distributed text source — the third entry point
  * of SURVEY.md §3, letting the engine run the full warehouse build on the
  * reference's OWN data (1,000 customers / 1,500 accounts / 15,000
  * transactions) rather than only the harness adapter.
  *
  * Pipeline (all columnar, no driver-side loops):
  *   text scan → filter INSERT lines → regexp-extract the VALUES tuple →
  *   strip T-SQL `N` unicode prefixes → `from_csv` with single-quote
  *   quoting, `''` escapes and bare NULL literals → typed columns.
  *
  * The CSV step reuses Spark's vectorized parser for the quoted-field
  * grammar (commas inside N'...' strings, escaped quotes), which a plain
  * split cannot handle. Schema enforcement is FAILFAST-equivalent: a
  * malformed row fails the `from_csv` + non-null PK assertion downstream
  * rather than silently nulling.
  */
object SeedSql {

  private val valuesTuple =
    "(?i)^\\s*insert\\s+into\\s+\\S+\\s*\\([^)]*\\)\\s*values\\s*\\((.*)\\)\\s*;?\\s*$"

  /** Parse every INSERT in `glob` into rows of `schema` (columns must be in
    * the INSERT's column order, which the seed generator keeps fixed).
    */
  def table(spark: SparkSession, glob: String, schema: StructType): DataFrame = {
    val opts = Map(
      "quote" -> "'",
      "escape" -> "'", // T-SQL doubles quotes: 'O''Brien'
      "nullValue" -> "NULL",
      "ignoreLeadingWhiteSpace" -> "true",
      "timestampNTZFormat" -> "yyyy-MM-dd HH:mm:ss",
      "mode" -> "FAILFAST")
    spark.read.textFile(glob)
      .toDF("line")
      .filter(col("line").rlike("(?i)^\\s*insert\\s+into"))
      .select(regexp_extract(col("line"), valuesTuple, 1).as("tuple"))
      // `N'...'` → `'...'`: the N prefix only ever precedes an opening quote
      // at a field start (tuple start or after ", ")
      .select(regexp_replace(col("tuple"), "(^|, )N'", "$1'").as("csvLine"))
      .select(from_csv(col("csvLine"), schema, opts).as("r"))
      .select(col("r.*"))
  }

  def customers(spark: SparkSession, dir: String): DataFrame =
    table(spark, s"$dir/tbl_Customers/*.sql", BankSchemas.customers)

  def accounts(spark: SparkSession, dir: String): DataFrame =
    table(spark, s"$dir/tbl_Accounts/*.sql", BankSchemas.accounts)

  def transactions(spark: SparkSession, dir: String): DataFrame =
    table(spark, s"$dir/tbl_Transactions/*.sql", BankSchemas.transactions)

  /** The full OLTP source set: seed scripts + the MCC dictionary CSV
    * (`etl.py:55` expects `tbl_MCC_Mapping.csv`; the reference repo does not
    * ship it, so callers pass a fixture with the same two-column schema).
    */
  def bank(spark: SparkSession, dir: String, mccCsv: String): graft.operators.BankEtl.Bank =
    graft.operators.BankEtl.Bank(
      customers(spark, dir),
      accounts(spark, dir),
      transactions(spark, dir),
      CsvSource.mccMapping(spark, mccCsv))
}
