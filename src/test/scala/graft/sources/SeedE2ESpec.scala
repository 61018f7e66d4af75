package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.BankEtl

/** Golden end-to-end run on the REFERENCE'S OWN seed data
  * (the `data_source/tbl_*` SQL scripts: 1,000 customers / 1,500 accounts /
  * 15,000 transactions of T-SQL INSERTs), parsed by [[SeedSql]] and pushed through
  * the full star-schema build.
  *
  * Expected values were computed independently in DuckDB from the same seed
  * scripts via the oracle CTE chain (same cleaning rules, classifier,
  * surrogate-key order, asOf = BankEtl.defaultAsOf), so this is a
  * cross-engine golden, not a self-fulfilling snapshot. The MCC dictionary
  * is the committed fixture (the reference expects `tbl_MCC_Mapping.csv`
  * next to etl.py but does not ship it, `etl.py:54-56`); it deliberately
  * omits two POS merchants (Winmart, Vietjet Air) so the reference's
  * str(NaN)="nan" (substring "an" hits the food list) quirk is exercised
  * on real rows.
  */
class SeedE2ESpec extends SparkSpec {

  private val seedDir = "/root/reference/data_source"
  private val mccCsv = "src/test/resources/bank/tbl_MCC_Mapping.csv"

  private lazy val bank = SeedSql.bank(spark, seedDir, mccCsv)
  private lazy val w = BankEtl.buildFrom(bank, cache = true)

  test("seed parse recovers the reference's exact row counts") {
    assert(bank.customers.count() == 1000L)
    assert(bank.accounts.count() == 1500L)
    assert(bank.transactions.count() == 15000L)
    // PKs parse non-null and unique
    assert(bank.transactions.filter(col("TransactionID").isNull).count() == 0)
    assert(bank.transactions.select("TransactionID").distinct().count() == 15000L)
  }

  test("seed parse preserves unicode, NULL-ness and types") {
    val c1 = bank.customers.filter(col("CustomerID") === 1).head()
    assert(c1.getString(1) == "Minh Hiếu" && c1.getString(2) == "Hoàng")
    assert(c1.getDate(3).toString == "1976-04-03")
    // POS rows: merchant set, no beneficiary/description; P2P: the reverse
    val pos = bank.transactions.filter(col("MerchantName").isNotNull)
    assert(pos.filter(col("BeneficiaryName").isNotNull ||
      col("TransactionDescription").isNotNull).count() == 0)
    val p2p = bank.transactions.filter(col("MerchantName").isNull)
    assert(p2p.filter(col("BeneficiaryName").isNull).count() == 0)
  }

  test("cleaning on reference data: golden survivor counts") {
    assert(w.cleanAccounts.count() == 730L)
    assert(w.cleanCustomers.count() == 479L)
    assert(w.cleanTransactions.count() == 7246L)
  }

  test("dimensions on reference data: golden cardinalities") {
    assert(w.dimCustomer.count() == 479L)
    assert(w.dimAccount.count() == 730L)
    assert(w.dimMerchant.count() == 473L)
    assert(w.dimLocation.count() == 4L)
    assert(w.dimDate.count() == 6527L)
    assert(w.fact.count() == 7246L)
  }

  test("dashboard Q2 (top categories) matches the DuckDB golden exactly") {
    val got = BankEtl.dashTopCategories(w.fact, w.dimMerchant)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq == Seq(
      ("Mua sắm", 5881026375.0),
      ("Ăn uống & Cà phê", 2617284413.0),
      ("Giải trí & Du lịch", 1729101895.0),
      ("Tạp hóa & Siêu thị", 920672813.0),
      ("Di chuyển & Vận tải", 688371707.0)))
  }

  test("dashboard Q3 (age groups) matches the DuckDB golden exactly") {
    val got = BankEtl.dashAgeGroups(w.fact, w.dimCustomer)
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq == Seq(
      ("> 50 (Cao tuổi)", 6069336732.0),
      ("35-50 (Trung niên)", 5165500956.0),
      ("25-34 (Người đi làm)", 1428490400.0),
      ("18-24 (Sinh viên)", 140673513.0)))
  }

  test("dashboard Q1 (monthly trend) matches the DuckDB golden") {
    val rows = BankEtl.dashTrend(w.fact, w.dimDate).collect()
    assert(rows.length == 48)
    assert(rows.head.getString(2) == "2022-01" && rows.head.getDouble(3) == 234349322.0)
    assert(rows.last.getString(2) == "2025-12" && rows.last.getDouble(3) == 120804905.0)
    assert(rows.map(_.getDouble(3)).sum == 1.2804001601e10)
  }
}
