package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.TestData

/** q236: the encoding advisor's verdicts, and the physical proof that the
  * advised encodings shrink real parquet bytes on disk.
  */
class EncodingAdvisorSpec extends SparkSpec {
  import spark.implicits._

  private def adviceOf(df: org.apache.spark.sql.DataFrame): Map[String, String] =
    Planning.encodingAdvisor(df).collect()
      .map(r => r.getAs[String]("col_name") -> r.getAs[String]("advice")).toMap

  /** A lineitem-shaped frame where each encoding branch is forced:
    * constant returnflag (1 run → run_length), alternating linestatus
    * (2 distinct, no runs → dictionary), unique prices (→ plain).
    */
  private def synthetic(n: Int) = (1 to n).map { i =>
    (i.toLong, 1L, 1L, 1, 1.0, 100.0 + i, 0.01, 0.02, "A",
      if (i % 2 == 0) "O" else "F", "1996-03-15 00:00:00")
  }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax",
      "l_returnflag", "l_linestatus", "ship_s")
    .withColumn("l_shipdate", col("ship_s").cast("timestamp_ntz")).drop("ship_s")

  test("advice branches: constant → run_length, small domain → dictionary, unique → plain") {
    val a = adviceOf(synthetic(512))
    assert(a("l_returnflag") == "run_length", "a constant column is one run")
    assert(a("l_linestatus") == "dictionary",
      "an alternating 2-value column has no runs but a tiny dictionary")
    assert(a("l_extendedprice") == "plain", "unique values earn no encoding")
  }

  test("real data: low-cardinality columns get dictionary, near-unique get plain") {
    val a = adviceOf(TestData.lineitem(spark, sf))
    for (c <- Seq("l_returnflag", "l_linestatus", "l_linenumber"))
      assert(a(c) == "dictionary", s"$c (tiny domain) must be dictionary, got ${a(c)}")
    assert(a("l_extendedprice") == "plain")
  }

  private def bytesOf(dir: String): Long =
    new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum

  test("on disk: dictionary encoding shrinks the advised dictionary column") {
    val out = java.nio.file.Files.createTempDirectory("graft-enc-spec")
    try {
      val flag = TestData.lineitem(spark, sf).select("l_returnflag").coalesce(1)
      flag.write.option("parquet.enable.dictionary", "true")
        .mode("overwrite").parquet(s"$out/dict")
      flag.write.option("parquet.enable.dictionary", "false")
        .mode("overwrite").parquet(s"$out/nodict")
      val (d, p) = (bytesOf(s"$out/dict"), bytesOf(s"$out/nodict"))
      assert(d < p, s"dictionary must shrink l_returnflag on disk: $d vs $p bytes")
    } finally graft.Scratch.rmTree(out.toFile)
  }

  test("on disk: the cluster order the run-length verdict assumes shrinks the file vs a shuffled order") {
    val out = java.nio.file.Files.createTempDirectory("graft-enc-spec")
    try {
      // 50k rows, 100 values in runs of 500 under the cluster order
      val runs = spark.range(50000)
        .select((col("id") / 500).cast("long").as("v"), col("id"))
      runs.orderBy("id").select("v").coalesce(1)
        .write.mode("overwrite").parquet(s"$out/clustered")
      runs.orderBy(md5(col("id").cast("string"))).select("v").coalesce(1)
        .write.mode("overwrite").parquet(s"$out/shuffled")
      val (c, s) = (bytesOf(s"$out/clustered"), bytesOf(s"$out/shuffled"))
      assert(c * 2 < s,
        s"run-preserving order must at least halve the bytes: $c vs $s")
    } finally graft.Scratch.rmTree(out.toFile)
  }
}
