package graft.operators

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.catalyst.expressions.DynamicPruningExpression

import graft.SparkSpec
import graft.sources.TestData

/** q279: the physical half of dynamic partition pruning — the executed
  * fact scan must carry a runtime DPP filter (the dim's surviving keys)
  * and open only the quarter's partition directories.
  */
class DppSpec extends SparkSpec {

  test("q279: the fact scan is runtime-pruned to the quarter's ym dirs") {
    val out = java.nio.file.Files.createTempDirectory("graft-dpp-spec")
    try {
      val df = Planning.dppStarJoin(TestData.lineitem(spark, sf),
        s"$out/star")
      df.collect()
      // ground truth from the layout itself: all ym dirs vs Q1 dirs
      val dirs = new java.io.File(s"$out/star/fact").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("ym="))
        .map(_.getName.stripPrefix("ym=").toLong)
      val q1 = dirs.filter(ym => (ym % 100) >= 1 && (ym % 100) <= 3)
      assert(q1.length > 0 && q1.length < dirs.length,
        s"spec needs a partial quarter: ${q1.length} of ${dirs.length}")
      // unwrap AQE: collect file scans through adaptive/stage wrappers
      def scans(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[FileSourceScanExec] = p match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          scans(a.executedPlan)
        case s: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
          scans(s.plan)
        case f: FileSourceScanExec => Seq(f)
        case other => other.children.flatMap(scans)
      }
      val factScans = scans(df.queryExecution.executedPlan)
        .filter(_.metadata.get("Location").exists(_.contains("fact")))
      assert(factScans.nonEmpty, "no fact file scan in the executed plan")
      val scan = factScans.head
      assert(scan.partitionFilters.exists(
        _.exists(_.isInstanceOf[DynamicPruningExpression])),
        s"fact scan must carry a DPP filter: ${scan.partitionFilters}")
      val opened = scan.metrics("numPartitions").value
      assert(opened == q1.length,
        s"DPP must open ${q1.length} of ${dirs.length} dirs, opened $opened")
    } finally graft.Scratch.rmTree(out.toFile)
  }
}
