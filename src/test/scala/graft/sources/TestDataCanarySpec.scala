package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Schema canary: one cheap read of every driver-generated table, asserting
  * the logical schema the engine is built against. When the driver
  * regenerates `/root/testdata` with a changed encoding (as happened in
  * round 7, when `events.ts` silently became TIMESTAMP_NTZ and 30 queries
  * vanished from the correctness run), this suite fails FIRST, naming the
  * table and column — not 30 anonymous downstream queries.
  *
  * Timestamp columns accept TIMESTAMP or TIMESTAMP_NTZ (both are handled
  * engine-wide; events additionally accepts nanos-long via
  * [[EventEncoding]]); any other drift is an error here.
  */
class TestDataCanarySpec extends SparkSpec {

  private val T = Set[DataType](TimestampType, TimestampNTZType)

  private def expect(table: String, df: DataFrame, cols: (String, Set[DataType])*): Unit = {
    val actual = df.schema.map(f => f.name -> f.dataType).toMap
    val missing = cols.map(_._1).filterNot(actual.contains)
    assert(missing.isEmpty, s"testdata drift: $table is missing column(s) ${missing.mkString(", ")}; " +
      s"actual schema: ${df.schema.simpleString}")
    for ((name, ok) <- cols) {
      assert(ok.contains(actual(name)),
        s"testdata drift: $table.$name has type ${actual(name)} (expected one of " +
          s"${ok.mkString("/")}) — update graft.sources to handle the new encoding")
    }
    assert(df.limit(1).count() == 1L, s"testdata drift: $table is empty")
  }

  private def t(dt: DataType): Set[DataType] = Set(dt)

  test("region/nation/customer/supplier/part schemas") {
    expect("region", TestData.region(spark, sf),
      "r_regionkey" -> t(IntegerType), "r_name" -> t(StringType))
    expect("nation", TestData.nation(spark, sf),
      "n_nationkey" -> t(IntegerType), "n_name" -> t(StringType), "n_regionkey" -> t(IntegerType))
    expect("customer", TestData.customer(spark, sf),
      "c_custkey" -> t(LongType), "c_name" -> t(StringType), "c_nationkey" -> t(IntegerType),
      "c_acctbal" -> t(DoubleType), "c_mktsegment" -> t(StringType))
    expect("supplier", TestData.supplier(spark, sf),
      "s_suppkey" -> t(LongType), "s_name" -> t(StringType), "s_nationkey" -> t(IntegerType),
      "s_acctbal" -> t(DoubleType))
    expect("part", TestData.part(spark, sf),
      "p_partkey" -> t(LongType), "p_name" -> t(StringType), "p_brand" -> t(StringType),
      "p_type" -> t(StringType), "p_size" -> t(IntegerType), "p_retailprice" -> t(DoubleType))
  }

  test("orders/lineitem schemas") {
    expect("orders", TestData.orders(spark, sf),
      "o_orderkey" -> t(LongType), "o_custkey" -> t(LongType), "o_orderstatus" -> t(StringType),
      "o_totalprice" -> t(DoubleType), "o_orderdate" -> T, "o_orderpriority" -> t(StringType))
    expect("lineitem", TestData.lineitem(spark, sf),
      "l_orderkey" -> t(LongType), "l_partkey" -> t(LongType), "l_suppkey" -> t(LongType),
      "l_linenumber" -> t(IntegerType), "l_quantity" -> t(DoubleType),
      "l_extendedprice" -> t(DoubleType), "l_discount" -> t(DoubleType), "l_tax" -> t(DoubleType),
      "l_returnflag" -> t(StringType), "l_linestatus" -> t(StringType), "l_shipdate" -> T)
  }

  test("events normalizes to the engine contract whatever the disk encoding") {
    expect("events", TestData.events(spark, sf),
      "event_id" -> t(LongType), "ts" -> t(TimestampType), "ts_ns" -> t(LongType),
      "user_id" -> t(LongType), "event_type" -> t(StringType), "value" -> t(DoubleType),
      "props" -> t(StringType))
  }

  test("documents/embeddings schemas") {
    expect("documents", TestData.documents(spark, sf),
      "doc_id" -> t(LongType), "text" -> t(StringType), "lang" -> t(StringType),
      "source" -> t(StringType), "n_chars" -> t(LongType))
    expect("embeddings", TestData.embeddings(spark, sf),
      "vec_id" -> t(LongType),
      "embedding" -> Set[DataType](ArrayType(FloatType, true), ArrayType(FloatType, false)),
      "label" -> t(IntegerType))
  }
}
