package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.TestData

/** int8 quantization invariants: codes stay in [-127, 127], the rounding
  * error bound 2·err ≤ amax holds for EVERY vector (it is a theorem, not a
  * statistic), and the zero vector degrades gracefully.
  */
class Int8QuantSpec extends SparkSpec {

  test("codes bounded and error contract holds corpus-wide") {
    val out = Similarity.int8Quantize(TestData.embeddings(spark, sf))
    assert(out.filter(col("max_code") > 127).count() === 0)
    assert(out.filter(col("within_bound") =!= 1).count() === 0)
    assert(out.count() > 0)
  }

  test("hand-checked vectors: zero vector, extremes, round-half-away") {
    val df = spark.createDataFrame(Seq(
      (1L, Array(0f, 0f)), // zero vector: amax 0, codes 0, in bound
      (2L, Array(1f, -1f)), // symmetric extremes: codes ±127, err 0
      (3L, Array(1f, 0.5f)) // 0.5 grid: code round(63.5) = 64 half-away
    )).toDF("vec_id", "embedding")
    val rows = Similarity.int8Quantize(df).orderBy("vec_id").collect()
    val byId = rows.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))).toMap
    assert(byId(1L) == ((0L, 0L, 0L, 1)))
    // quant grid: ±1f -> ±10000 exactly, amax 10000, codes ±127, err 0
    assert(byId(2L) == ((10000L, 127L, 0L, 1)))
    // 1f,0.5f -> (10000, 5000), amax 10000: code(5000) = round(63.5) = 64,
    // err = |5000*127 - 64*10000| = 5000 = amax/2 — the exact bound edge
    assert(byId(3L) == ((10000L, 127L, 5000L, 1)))
  }
}
