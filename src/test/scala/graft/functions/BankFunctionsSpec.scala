package graft.functions

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.BankFunctions._

/** Golden-row tests for every scalar derivation, including the reference's
  * load-bearing quirks (SURVEY.md §7.4).
  */
class BankFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def classify(desc: String): String =
    Seq(Option(desc)).toDF("d")
      .select(categoryFromDescription(col("d")).as("c")).head().getString(0)

  test("classifier: every keyword list reachable") {
    assert(classify("an toi voi ban") == "Ăn uống & Cà phê")
    assert(classify("mua ao khoac moi") == "Mua sắm")
    assert(classify("tien grab di lam") == "Di chuyển & Vận tải")
    assert(classify("dong hoc phi ky 1") == "Hóa đơn & Dịch vụ")
    assert(classify("du lich da lat") == "Giải trí & Du lịch")
    assert(classify("keo cho em be") == "Tạp hóa & Siêu thị")
    // 'gao' contains the shopping keyword 'ao' as a substring → shopping wins
    assert(classify("gao va keo") == "Mua sắm")
    assert(classify("tra no") == "Chuyển khoản khác")
  }

  test("classifier quirk: 'an' substring matches inside words (etl.py:208)") {
    // "thanh toAN" — a transfer phrase lands in food because 'an' is a substring
    assert(classify("thanh toan tien cho") == "Ăn uống & Cà phê")
    assert(classify("chuyen khoan cho me") == "Ăn uống & Cà phê")
  }

  test("classifier quirk: null description stringifies to 'nan' → contains 'an' → food") {
    assert(classify(null) == "Ăn uống & Cà phê")
  }

  test("classifier quirk: 'nuoc' is in both food and bills lists; food wins by order") {
    assert(classify("nuoc") == "Ăn uống & Cà phê")
  }

  test("classifier quirk: first-list-wins ordering ('mua' beats grocery words)") {
    assert(classify("mua rau qua gao") == "Mua sắm")
  }

  test("classifier quirk: 'xe' matches inside 'xem' → transport, not entertainment") {
    assert(classify("ve xem phim toi nay") == "Di chuyển & Vận tải")
  }

  test("custom keyword kernel equals the composed when/contains chain on real descriptions") {
    val tx = graft.operators.BankEtl.read(spark, sf).transactions
      .select(col("TransactionDescription").as("d"))
    val diff = tx.select(
      categoryFromDescription(col("d")).as("a"),
      categoryFromDescriptionComposed(col("d")).as("b"))
      .filter(col("a") =!= col("b"))
    assert(diff.count() == 0)
  }

  private def bucket(age: Int): String =
    Seq(age).toDF("a").select(ageGroup(col("a")).as("g")).head().getString(0)

  test("age buckets: exact edges 17/18/24/25/34/35/50/51 (etl.py:148-155)") {
    assert(bucket(17) == "< 18")
    assert(bucket(18) == "18-24 (Sinh viên)")
    assert(bucket(24) == "18-24 (Sinh viên)")
    assert(bucket(25) == "25-34 (Người đi làm)")
    assert(bucket(34) == "25-34 (Người đi làm)")
    assert(bucket(35) == "35-50 (Trung niên)")
    assert(bucket(50) == "35-50 (Trung niên)")
    assert(bucket(51) == "> 50 (Cao tuổi)")
  }

  test("age: calendar-naive 365-day division (etl.py:145)") {
    val df = Seq((Date.valueOf("2000-03-01"), Date.valueOf("2026-01-01"))).toDF("b", "asof")
    val a = df.select(age(col("b"), col("asof"))).head().getLong(0)
    assert(a == 25) // 9437 days / 365 = 25.85… → floor 25
  }

  test("day-of-week: Vietnamese numbering, golden Sunday (etl.py:243-252)") {
    // 2024-01-07 is a Sunday; 2024-01-01 a Monday; 2024-01-06 a Saturday
    val df = Seq(
      Timestamp.valueOf("2024-01-01 10:00:00"),
      Timestamp.valueOf("2024-01-06 10:00:00"),
      Timestamp.valueOf("2024-01-07 10:00:00")).toDF("ts")
      .select(dayOfWeekVn(col("ts")).as("dow"))
      .withColumn("name", dayName(col("dow")))
      .withColumn("wknd", isWeekend(col("dow")))
      .collect()
    assert(df(0).getInt(0) == 2 && df(0).getString(1) == "Thứ Hai" && !df(0).getBoolean(2))
    assert(df(1).getInt(0) == 7 && df(1).getString(1) == "Thứ Bảy" && df(1).getBoolean(2))
    assert(df(2).getInt(0) == 8 && df(2).getString(1) == "Chủ Nhật" && df(2).getBoolean(2))
  }

  test("Date_Key: yyyyMMddHH as int, zero-padded (etl.py:261-266)") {
    val k = Seq(Timestamp.valueOf("2025-03-07 05:09:59")).toDF("ts")
      .select(dateKey(col("ts"))).head().getInt(0)
    assert(k == 2025030705)
  }

  test("region bucketing: all three domestic spellings (etl.py:178-183)") {
    val r = Seq("Việt Nam", "Vietnam", "Viet Nam", "Nhật Bản", "NATION_9")
      .toDF("c").select(region(col("c"))).as[String].collect()
    assert(r.toSeq == Seq("Trong nước", "Trong nước", "Trong nước", "Nước ngoài", "Nước ngoài"))
  }

  test("month name: no zero pad (etl.py:255)") {
    val m = Seq(3, 11).toDF("m").select(monthName(col("m"))).as[String].collect()
    assert(m.toSeq == Seq("Tháng 3", "Tháng 11"))
  }

  test("year-month dashboard label zero-pads month (dashboard.py:37)") {
    val ym = Seq((2023, 4)).toDF("y", "m")
      .select(yearMonth(col("y"), col("m"))).head().getString(0)
    assert(ym == "2023-04")
  }

  test("display currency formatter (dashboard.py:77-83)") {
    assert(formatCurrencyVn(1.5e9) == "1.5 Tỷ")
    assert(formatCurrencyVn(2.34e6) == "2.3 Tr")
    assert(formatCurrencyVn(999) == "999")
  }
}
