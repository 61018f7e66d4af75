package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Schema-enforced CSV reader (SURVEY.md S2 — the reference reads its MCC
  * dictionary with `pd.read_csv`, `etl_pipeline/etl.py:55-56`).
  *
  * `FAILFAST` + explicit schema: a malformed dictionary aborts the job
  * instead of silently nulling categories. Header is positional — column
  * names come from the declared schema, not the file.
  */
object CsvSource {
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("header", "true")
      .option("mode", "FAILFAST")
      .schema(schema)
      .csv(path)

  /** The MCC dictionary from CSV, ready for the classifier's broadcast
    * lookup join.
    */
  def mccMapping(spark: SparkSession, path: String): DataFrame =
    read(spark, path, BankSchemas.mccMapping)
}
