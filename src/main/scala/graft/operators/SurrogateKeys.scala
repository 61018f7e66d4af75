package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Deterministic, contiguous, 1-based surrogate keys — the distributed
  * replacement for the reference's SQL Server IDENTITY columns
  * (`schema.sql:85,96,103,109,116`) and the load/read-back round-trip they
  * forced (`etl.py:300-326`). Keys exist inside the DAG before any write.
  *
  * Implementation: range-repartition on the ordering key, sort within
  * partitions, then `zipWithIndex`. Unlike a global
  * `row_number().over(Window.orderBy(...))` — which collapses to a SINGLE
  * partition and dies at cluster scale — this keeps full parallelism: the
  * only extra cost is zipWithIndex's small job to count per-partition sizes.
  * The assignment equals `ROW_NUMBER() OVER (ORDER BY key)` exactly (ties
  * impossible: callers order by a unique natural key), which is what the
  * DuckDB oracle uses.
  */
object SurrogateKeys {

  def dense(df: DataFrame, keyName: String, order: Column*): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = StructType(StructField(keyName, LongType, nullable = false) +: sorted.schema.fields)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) => Row.fromSeq((i + 1L) +: r.toSeq) }
    spark.createDataFrame(rdd, schema)
  }
}
