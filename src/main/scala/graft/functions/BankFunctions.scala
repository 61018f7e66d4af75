package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar derivations of the reference warehouse, each as a native Catalyst
  * column expression (codegen-friendly — no UDFs; reference does these as
  * row-wise pandas `apply`, see `etl_pipeline/etl.py:148-266`).
  *
  * Every function has a twin `...Sql` generator producing the equivalent
  * DuckDB SQL from the SAME Scala constants, so engine and oracle cannot
  * drift.
  */
object BankFunctions {

  // ---- D2: age bucketing (etl.py:148-155). Labels are observable schema —
  // verbatim Vietnamese, never translated.
  val ageGroups: Seq[(Int, Int, String)] = Seq(
    (Int.MinValue, 17, "< 18"),
    (18, 24, "18-24 (Sinh viên)"),
    (25, 34, "25-34 (Người đi làm)"),
    (35, 50, "35-50 (Trung niên)"),
  )
  val ageGroupElse = "> 50 (Cao tuổi)"

  def ageGroup(age: Column): Column =
    ageGroups.foldLeft(org.apache.spark.sql.functions.when(lit(false), lit(""))) {
      case (acc, (lo, hi, label)) => acc.when(age >= lit(lo) && age <= lit(hi), lit(label))
    }.otherwise(lit(ageGroupElse))

  def ageGroupSql(age: String): String =
    ageGroups.map { case (lo, hi, label) =>
      s"WHEN ($age) >= $lo AND ($age) <= $hi THEN '$label'"
    }.mkString("CASE ", " ", s" ELSE '$ageGroupElse' END")

  // ---- D1: calendar-naive age (etl.py:145-146): floor(days/365), with the
  // reference's wall-clock `now` replaced by an injectable asOf date.
  def age(birthDate: Column, asOf: Column): Column =
    floor(datediff(asOf, birthDate) / lit(365))

  def ageSql(birthDate: String, asOf: String): String =
    s"date_diff('day', $birthDate, $asOf) // 365"

  // ---- D4: region bucketing (etl.py:178-183).
  val domesticCountries = Seq("Việt Nam", "Vietnam", "Viet Nam")
  val regionDomestic = "Trong nước"
  val regionForeign = "Nước ngoài"

  def region(country: Column): Column =
    when(country.isin(domesticCountries: _*), lit(regionDomestic)).otherwise(lit(regionForeign))

  def regionSql(country: String): String = {
    val list = domesticCountries.map(c => s"'$c'").mkString(", ")
    s"CASE WHEN ($country) IN ($list) THEN '$regionDomestic' ELSE '$regionForeign' END"
  }

  // ---- D6: the category classifier (etl.py:197-224). Ordered substring
  // checks, first list that matches wins. Substring semantics are
  // load-bearing: 'an' matches "thanh toAN", 'nuoc' is in both the food and
  // bills lists (food wins by order). A null description stringifies to
  // "nan" in the reference (pandas str(NaN)) — which CONTAINS 'an', so
  // unmatched-POS rows classify as food. Replicated verbatim.
  val keywordLists: Seq[(Seq[String], String)] = Seq(
    (Seq("an", "com", "pho", "bun", "cafe", "nuoc", "tra sua", "nhau"), "Ăn uống & Cà phê"),
    (Seq("mua", "shop", "quan", "ao", "giay", "tui", "my pham", "son", "vay"), "Mua sắm"),
    (Seq("xe", "grab", "xang", "ship", "taxi", "di lai"), "Di chuyển & Vận tải"),
    (Seq("dien", "mang", "wifi", "nha", "hoc", "nuoc", "phi", "internet"), "Hóa đơn & Dịch vụ"),
    (Seq("phim", "du lich", "ve", "spa", "game", "homestay", "karaoke"), "Giải trí & Du lịch"),
    (Seq("tap hoa", "rau", "qua", "gao", "sieu thi", "banh", "keo"), "Tạp hóa & Siêu thị"),
  )
  val fallbackCategory = "Chuyển khoản khác"

  /** Normalized description: lower(str(desc)) with the pandas NaN→"nan" quirk. */
  private def descNorm(desc: Column): Column = lower(coalesce(desc, lit("nan")))
  private def descNormSql(desc: String): String = s"lower(coalesce($desc, 'nan'))"

  /** Single-pass custom kernel (see [[graft.plans.FirstKeywordMatch]]). */
  def categoryFromDescription(desc: Column): Column =
    graft.plans.FirstKeywordMatch.first_keyword_match(
      descNorm(desc), keywordLists.map(_._1), keywordLists.map(_._2), fallbackCategory)

  /** The same semantics composed from built-ins (when + contains chain) —
    * kept as the differential-test twin of the custom kernel.
    */
  def categoryFromDescriptionComposed(desc: Column): Column = {
    val d = descNorm(desc)
    keywordLists.foldLeft(when(lit(false), lit(""))) { case (acc, (kws, label)) =>
      acc.when(kws.map(k => d.contains(k)).reduce(_ || _), lit(label))
    }.otherwise(lit(fallbackCategory))
  }

  def categoryFromDescriptionSql(desc: String): String = {
    val d = descNormSql(desc)
    keywordLists.map { case (kws, label) =>
      val cond = kws.map(k => s"$d LIKE '%$k%'").mkString("(", " OR ", ")")
      s"WHEN $cond THEN '$label'"
    }.mkString("CASE ", " ", s" ELSE '$fallbackCategory' END")
  }

  // ---- D8/D9/D10: Vietnamese day-of-week. pandas dayofweek+2: Mon=2..Sun=8
  // (etl.py:243-252). Spark dayofweek is Sun=1..Sat=7 → shift.
  def dayOfWeekVn(ts: Column): Column = ((dayofweek(ts) + lit(5)) % lit(7)) + lit(2)
  def dayOfWeekVnSql(ts: String): String = s"CAST(isodow($ts) + 1 AS INT)"

  val dayNames: Map[Int, String] = Map(
    2 -> "Thứ Hai", 3 -> "Thứ Ba", 4 -> "Thứ Tư", 5 -> "Thứ Năm",
    6 -> "Thứ Sáu", 7 -> "Thứ Bảy", 8 -> "Chủ Nhật")

  def dayName(dow: Column): Column =
    dayNames.toSeq.sortBy(_._1).foldLeft(when(lit(false), lit(""))) {
      case (acc, (n, label)) => acc.when(dow === lit(n), lit(label))
    }.otherwise(lit(null).cast("string"))

  def dayNameSql(dow: String): String =
    dayNames.toSeq.sortBy(_._1)
      .map { case (n, label) => s"WHEN $n THEN '$label'" }
      .mkString(s"CASE ($dow) ", " ", " ELSE NULL END")

  def isWeekend(dow: Column): Column = dow.isin(7, 8)
  def isWeekendSql(dow: String): String = s"($dow) IN (7, 8)"

  // ---- D11: month name 'Tháng N' (no zero-pad, etl.py:255).
  def monthName(month: Column): Column = concat(lit("Tháng "), month.cast("string"))
  def monthNameSql(month: String): String = s"'Tháng ' || CAST($month AS VARCHAR)"

  // ---- D12: Date_Key = yyyyMMddHH as INT (etl.py:261-266, 355-360).
  def dateKey(ts: Column): Column = date_format(ts, "yyyyMMddHH").cast("int")
  def dateKeySql(ts: String): String = s"CAST(strftime($ts, '%Y%m%d%H') AS INT)"

  // ---- D14: dashboard year-month label '2023-04' (dashboard.py:37).
  def yearMonth(year: Column, month: Column): Column =
    format_string("%d-%02d", year, month)
  def yearMonthSql(year: String, month: String): String =
    s"CAST($year AS VARCHAR) || '-' || lpad(CAST($month AS VARCHAR), 2, '0')"

  // ---- D15: display currency formatter (dashboard.py:77-83) — presentation
  // only, not part of any query result.
  def formatCurrencyVn(x: Double): String =
    if (x >= 1e9) f"${x * 1e-9}%.1f Tỷ"
    else if (x >= 1e6) f"${x * 1e-6}%.1f Tr"
    else f"$x%.0f"
}
