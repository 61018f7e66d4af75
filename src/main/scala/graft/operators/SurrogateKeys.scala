package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Deterministic, contiguous, 1-based surrogate keys — the distributed
  * replacement for the reference's SQL Server IDENTITY columns
  * (`schema.sql:85,96,103,109,116`) and the load/read-back round-trip they
  * forced (`etl.py:300-326`). Keys exist inside the DAG before any write.
  *
  * Implementation: range-repartition on the ordering key, sort within
  * partitions, then `zipWithIndex` over the physical plan's
  * `InternalRow` RDD. Unlike a global `row_number().over(Window.orderBy(...))`
  * — which collapses to a SINGLE partition and dies at cluster scale — this
  * keeps full parallelism: the only extra cost is zipWithIndex's small job to
  * count per-partition sizes. Rows never leave Tungsten: the key is prepended
  * with an UnsafeProjection over the same UnsafeRows the sort produced (no
  * `Row.toSeq` re-boxing, no external-row encoder round-trip), and both of
  * zipWithIndex's passes run over the SAME RDD instance
  * (`queryExecution.toRdd` is a lazy val), so the range boundaries the count
  * saw are exactly the ones the assignment pass sees.
  *
  * The assignment equals `ROW_NUMBER() OVER (ORDER BY key)` exactly when the
  * ordering is total; callers order by a unique natural key (or by every
  * column, in which case tied rows are indistinguishable and any pairing
  * yields the same result set), which is what the DuckDB oracle mirrors.
  */
object SurrogateKeys {

  def dense(df: DataFrame, keyName: String, order: Column*): DataFrame = {
    val sorted = df.repartitionByRange(order: _*).sortWithinPartitions(order: _*)
    val schema = StructType(
      StructField(keyName, LongType, nullable = false) +: sorted.schema.fields)
    val rdd = sorted.queryExecution.toRdd.zipWithIndex().mapPartitions { it =>
      val keyRow = new GenericInternalRow(1)
      val joined = new JoinedRow
      val project = UnsafeProjection.create(schema)
      it.map { case (row, i) =>
        keyRow.update(0, i + 1L)
        project(joined(keyRow, row)): InternalRow
      }
    }
    ColumnBridge.internalDf(df.sparkSession, rdd, schema)
  }
}
