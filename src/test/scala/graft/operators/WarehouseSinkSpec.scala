package graft.operators

import java.nio.file.Files

import graft.SparkSpec

class WarehouseSinkSpec extends SparkSpec {

  test("S4: warehouse writes round-trip; fact is partitioned by year-month") {
    val out = Files.createTempDirectory("wh").toString
    val w = BankEtl.build(spark, sf, cache = true)
    WarehouseSink.write(w, out)

    val factBack = spark.read.parquet(s"$out/Fact_Spending")
    assert(factBack.count() == w.fact.count())
    // partition pruning surface: ym=yyyyMM directories exist
    val partDirs = new java.io.File(s"$out/Fact_Spending").listFiles()
      .filter(_.getName.startsWith("ym="))
    assert(partDirs.length > 1)

    val dimBack = spark.read.parquet(s"$out/Dim_Merchant")
    assert(dimBack.count() == w.dimMerchant.count())
  }
}
