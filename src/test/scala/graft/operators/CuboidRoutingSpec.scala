package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** q259: the lattice router picks the smallest subsuming cuboid and the
  * cuboid-answered aggregates equal the base-answered ones.
  */
class CuboidRoutingSpec extends SparkSpec {

  test("routing picks the smallest subsuming cuboid; answers match base") {
    val out = java.nio.file.Files.createTempDirectory("graft-cr-spec")
    try {
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
      val rows = Planning.cuboidRouting(li, out.toString).collect()
        .map(r => r.getAs[String]("query_dims") -> r).toMap
      assert(rows.keySet == Set("rf", "ls", "yr"))
      // 'ls' has a dedicated 2-row cuboid; rf/yr must prefer the partial
      // rollup (rf, yr) over the finest (rf, ls, yr) — strictly fewer rows
      assert(rows("ls").getAs[String]("routed_cuboid") == "ls")
      assert(rows("ls").getAs[Long]("cuboid_rows") == 2L)
      assert(rows("rf").getAs[String]("routed_cuboid") == "rf_yr")
      assert(rows("yr").getAs[String]("routed_cuboid") == "rf_yr")
      // answered-from-cuboid == answered-from-base, per target
      for ((qname, dims) <- Seq("rf" -> "l_returnflag", "ls" -> "l_linestatus")) {
        val direct = li
          .select(col(dims).as("d"),
            graft.functions.OracleSafe.quant(col("l_quantity"), 100).as("qc"))
          .groupBy("d").agg(count(lit(1)).as("gn"), sum("qc").as("gq"))
          .agg(count(lit(1)), sum("gn"), sum("gq"), max("gq")).head()
        val r = rows(qname)
        assert(r.getAs[Long]("n_groups") == direct.getLong(0), s"$qname groups")
        assert(r.getAs[Long]("n_rows") == direct.getLong(1), s"$qname rows")
        assert(r.getAs[Long]("total_qc") == direct.getLong(2), s"$qname total")
        assert(r.getAs[Long]("max_group_qc") == direct.getLong(3), s"$qname max")
      }
    } finally graft.Scratch.rmTree(out.toFile)
  }
}
