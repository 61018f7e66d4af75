package graft.charts

import java.nio.file.{Files, Path, Paths}

import graft.functions.BankFunctions.formatCurrencyVn
import graft.operators.BankEtl

/** The reference's user-facing deliverable: three dashboard figures
  * (`scripts/dashboard.py:88-129` — line trend, horizontal top-5 bars,
  * vertical age-group bars). Rendered as dependency-free SVG: the chart
  * step is a presentation boundary over already-aggregated query results
  * (48/5/4 rows), so a driver-side collect here is the correct shape even
  * at 100 TB — all heavy lifting stays distributed in the dashboard
  * queries.
  *
  * Axis money ticks use the same "1.5 Tỷ"/"2.3 Tr" formatter the reference
  * applies (`dashboard.py:77-83`, our D15 [[formatCurrencyVn]]).
  */
object SvgCharts {

  private val W = 960
  private val H = 480
  private val MarginL = 100
  private val MarginR = 24
  private val MarginT = 56
  private val MarginB = 96

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def header(title: String): String =
    s"""<svg xmlns="http://www.w3.org/2000/svg" width="$W" height="$H" viewBox="0 0 $W $H" font-family="sans-serif">
       |<rect width="$W" height="$H" fill="white"/>
       |<text x="${W / 2}" y="28" text-anchor="middle" font-size="20" font-weight="bold" fill="#2c3e50">${esc(title)}</text>""".stripMargin

  private def axisLabels(xLabel: String, yLabel: String): String =
    s"""<text x="${MarginL + (W - MarginL - MarginR) / 2}" y="${H - 8}" text-anchor="middle" font-size="14">${esc(xLabel)}</text>
       |<text x="18" y="${MarginT + (H - MarginT - MarginB) / 2}" text-anchor="middle" font-size="14" transform="rotate(-90 18 ${MarginT + (H - MarginT - MarginB) / 2})">${esc(yLabel)}</text>""".stripMargin

  /** 5 horizontal gridlines + money tick labels on the y axis. */
  private def yMoneyTicks(maxV: Double): String = {
    val plotH = H - MarginT - MarginB
    (0 to 4).map { i =>
      val v = maxV * i / 4.0
      val y = MarginT + plotH - plotH * i / 4.0
      s"""<line x1="$MarginL" y1="$y" x2="${W - MarginR}" y2="$y" stroke="#dddddd"/>
         |<text x="${MarginL - 6}" y="${y + 4}" text-anchor="end" font-size="11">${esc(formatCurrencyVn(v))}</text>""".stripMargin
    }.mkString("\n")
  }

  /** Monthly trend as a marked polyline (dashboard.py:89-101).
    * An empty series renders an empty-axes chart (an all-filtered warehouse
    * must not crash the presentation step).
    */
  def lineChart(points: Seq[(String, Double)], title: String,
      xLabel: String, yLabel: String): String = {
    val plotW = W - MarginL - MarginR
    val plotH = H - MarginT - MarginB
    val maxV = math.max(points.map(_._2).maxOption.getOrElse(0.0), 1.0) * 1.05
    def x(i: Int) = MarginL + (if (points.size == 1) plotW / 2.0
      else plotW * i.toDouble / (points.size - 1))
    def y(v: Double) = MarginT + plotH - plotH * v / maxV
    val poly = points.zipWithIndex
      .map { case ((_, v), i) => f"${x(i)}%.1f,${y(v)}%.1f" }.mkString(" ")
    val markers = points.zipWithIndex.map { case ((_, v), i) =>
      f"""<circle cx="${x(i)}%.1f" cy="${y(v)}%.1f" r="3" fill="#2ecc71"/>"""
    }.mkString("\n")
    val labelEvery = math.max(1, math.ceil(points.size / 16.0).toInt)
    val xticks = points.zipWithIndex.collect {
      case ((label, _), i) if i % labelEvery == 0 =>
        val xi = x(i)
        f"""<text x="$xi%.1f" y="${MarginT + plotH + 14}" font-size="10" text-anchor="end" transform="rotate(-45 $xi%.1f ${MarginT + plotH + 14})">${esc(label)}</text>"""
    }.mkString("\n")
    val polyline = if (points.isEmpty) ""
      else s"""<polyline points="$poly" fill="none" stroke="#2ecc71" stroke-width="2.5"/>"""
    s"""${header(title)}
       |${yMoneyTicks(maxV)}
       |$polyline
       |$markers
       |$xticks
       |${axisLabels(xLabel, yLabel)}
       |</svg>""".stripMargin
  }

  private val palette =
    Seq("#440154", "#3b528b", "#21918c", "#5ec962", "#fde725") // viridis stops

  /** Horizontal bars, longest on top (dashboard.py:104-115). Empty input →
    * empty-axes chart (no bars), never a division by zero.
    */
  def barChartH(items: Seq[(String, Double)], title: String,
      xLabel: String, yLabel: String): String = {
    val plotW = W - MarginL - MarginR - 120 // room for category labels
    val left = MarginL + 120
    val plotH = H - MarginT - MarginB
    val maxV = math.max(items.map(_._2).maxOption.getOrElse(0.0), 1.0) * 1.05
    val bh = plotH / math.max(items.size, 1)
    val bars = items.zipWithIndex.map { case ((label, v), i) =>
      val y = MarginT + i * bh
      val w = plotW * v / maxV
      f"""<rect x="$left" y="${y + bh * 0.15}%.1f" width="$w%.1f" height="${bh * 0.7}%.1f" fill="${palette(i % palette.size)}"/>
         |<text x="${left - 6}" y="${y + bh / 2 + 4}%.1f" text-anchor="end" font-size="12">${esc(label)}</text>""".stripMargin
    }.mkString("\n")
    val xticks = (0 to 4).map { i =>
      val v = maxV * i / 4.0
      val x = left + plotW * i / 4.0
      s"""<line x1="$x" y1="$MarginT" x2="$x" y2="${MarginT + plotH}" stroke="#dddddd"/>
         |<text x="$x" y="${MarginT + plotH + 16}" text-anchor="middle" font-size="11">${esc(formatCurrencyVn(v))}</text>""".stripMargin
    }.mkString("\n")
    s"""${header(title)}
       |$xticks
       |$bars
       |${axisLabels(xLabel, yLabel)}
       |</svg>""".stripMargin
  }

  /** Vertical bars (dashboard.py:118-129). Empty input → empty-axes chart. */
  def barChartV(items: Seq[(String, Double)], title: String,
      xLabel: String, yLabel: String): String = {
    val plotW = W - MarginL - MarginR
    val plotH = H - MarginT - MarginB
    val maxV = math.max(items.map(_._2).maxOption.getOrElse(0.0), 1.0) * 1.05
    val bw = plotW / math.max(items.size, 1)
    val bars = items.zipWithIndex.map { case ((label, v), i) =>
      val x = MarginL + i * bw
      val h = plotH * v / maxV
      f"""<rect x="${x + bw * 0.15}%.1f" y="${MarginT + plotH - h}%.1f" width="${bw * 0.7}%.1f" height="$h%.1f" fill="${palette(i % palette.size)}"/>
         |<text x="${x + bw / 2}%.1f" y="${MarginT + plotH + 16}" text-anchor="middle" font-size="12">${esc(label)}</text>""".stripMargin
    }.mkString("\n")
    s"""${header(title)}
       |${yMoneyTicks(maxV)}
       |$bars
       |${axisLabels(xLabel, yLabel)}
       |</svg>""".stripMargin
  }

  /** Compute the three dashboards from the warehouse and write the three
    * figures (same names/titles as `scripts/dashboard.py`, SVG medium).
    */
  def renderDashboards(w: BankEtl.Warehouse, outDir: String): Seq[Path] = {
    val dir = Paths.get(outDir)
    Files.createDirectories(dir)

    val trend = BankEtl.dashTrend(w.fact, w.dimDate).collect()
      .map(r => (r.getString(2), r.getDouble(3))).toSeq
    val cats = BankEtl.dashTopCategories(w.fact, w.dimMerchant).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq
    val ages = BankEtl.dashAgeGroups(w.fact, w.dimCustomer).collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq

    def write(name: String, svg: String): Path =
      Files.write(dir.resolve(name), svg.getBytes("UTF-8"))

    Seq(
      write("1_XuHuongChiTieu.svg", lineChart(trend,
        "Xu Hướng Chi Tiêu Theo Tháng", "Thời gian", "Tổng Tiền (VNĐ)")),
      write("2_TopHangMuc.svg", barChartH(cats,
        "Top 5 Hạng Mục Chi Tiêu Lớn Nhất", "Tổng Tiền (VNĐ)", "Hạng Mục")),
      write("3_NhomTuoi.svg", barChartV(ages,
        "Mức Chi Tiêu Theo Nhóm Tuổi Khách Hàng", "Nhóm Tuổi", "Tổng Tiền (VNĐ)")))
  }
}
