package graft.charts

import java.nio.file.Files

import graft.SparkSpec
import graft.operators.BankEtl
import graft.sources.SeedSql

/** Golden structure test of the three shipped figures on the REFERENCE'S
  * OWN seed data (`data_source/tbl_*`): file names, exact Vietnamese titles
  * (`dashboard.py:89-129`), and mark counts tied to the dashboard query
  * cardinalities — one polyline + one marker per month for the trend, one
  * bar per top-5 category, one bar per age group.
  */
class SvgChartsSpec extends SparkSpec {

  // Reference checkout root; overridable so the suite runs (or skips
  // gracefully) on machines without the reference at the default path.
  private val refData =
    sys.props.getOrElse("graft.reference.data", "/root/reference/data_source")

  private lazy val w = BankEtl.buildFrom(
    SeedSql.bank(spark, refData,
      "src/test/resources/bank/tbl_MCC_Mapping.csv"),
    cache = true)

  private def count(svg: String, token: String): Int =
    java.util.regex.Pattern.quote(token).r.findAllIn(svg).size

  // Every chart has one full-canvas background rect (`<rect width=`);
  // data-mark bars are positioned rects (`<rect x=`). Count only marks.
  private def countBars(svg: String): Int = count(svg, "<rect x=")

  test("renderDashboards writes the three reference figures with pinned titles") {
    assume(Files.exists(java.nio.file.Paths.get(refData)),
      s"reference seed data not present at $refData")
    val dir = Files.createTempDirectory("graft-charts").toString
    val paths = SvgCharts.renderDashboards(w, dir)
    assert(paths.map(_.getFileName.toString) ==
      Seq("1_XuHuongChiTieu.svg", "2_TopHangMuc.svg", "3_NhomTuoi.svg"))
    val Seq(trendSvg, catsSvg, agesSvg) =
      paths.map(p => new String(Files.readAllBytes(p), "UTF-8"))
    assert(trendSvg.contains("Xu Hướng Chi Tiêu Theo Tháng"))
    assert(catsSvg.contains("Top 5 Hạng Mục Chi Tiêu Lớn Nhất"))
    assert(agesSvg.contains("Mức Chi Tiêu Theo Nhóm Tuổi Khách Hàng"))

    // mark counts == dashboard query cardinalities
    val nMonths = BankEtl.dashTrend(w.fact, w.dimDate).count().toInt
    val nCats = BankEtl.dashTopCategories(w.fact, w.dimMerchant).count().toInt
    val nAges = BankEtl.dashAgeGroups(w.fact, w.dimCustomer).count().toInt
    assert(count(trendSvg, "<polyline") == 1)
    assert(count(trendSvg, "<circle") == nMonths && nMonths > 0)
    assert(countBars(catsSvg) == nCats && nCats == 5)
    assert(countBars(agesSvg) == nAges && nAges > 0)
  }

  test("empty inputs render empty-axes charts instead of crashing") {
    val empty = Seq.empty[(String, Double)]
    for (svg <- Seq(
        SvgCharts.lineChart(empty, "t", "x", "y"),
        SvgCharts.barChartH(empty, "t", "x", "y"),
        SvgCharts.barChartV(empty, "t", "x", "y"))) {
      assert(svg.startsWith("<svg") && svg.endsWith("</svg>"))
      assert(count(svg, "<circle") == 0 && countBars(svg) == 0)
    }
  }
}
