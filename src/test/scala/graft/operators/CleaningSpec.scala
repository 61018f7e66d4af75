package graft.operators

import java.sql.{Date, Timestamp}

import graft.SparkSpec

/** Boundary semantics of the three cleaning rules on a micro fixture
  * (SURVEY.md §5.1): strict `>` for account-vs-birth, `>=` for
  * transaction-vs-open, inner joins as orphan filters.
  */
class CleaningSpec extends SparkSpec {
  import spark.implicits._

  private val customers = Seq(
    (1, "A", "X", Date.valueOf("1990-01-01")),
    (2, "B", "Y", Date.valueOf("2000-06-15")),
    (3, "C", "Z", Date.valueOf("1980-01-01"))) // will end up ownerless
    .toDF("CustomerID", "FirstName", "LastName", "BirthDate")

  private val accounts = Seq(
    (100, 1, "Debit", Timestamp.valueOf("2010-01-01 00:00:00")),  // valid
    (101, 2, "Credit", Timestamp.valueOf("2000-06-15 00:00:00")), // == birth → dropped (strict >)
    (102, 2, "Debit", Timestamp.valueOf("2000-06-16 00:00:00")),  // day after birth → kept
    (103, 3, "Debit", Timestamp.valueOf("1979-12-31 00:00:00")),  // before birth → dropped
    (104, 99, "Debit", Timestamp.valueOf("2010-01-01 00:00:00"))) // unknown customer → dropped
    .toDF("AccountID", "CustomerID", "AccountType", "OpenDate")

  private val transactions = Seq(
    (1L, 100, Timestamp.valueOf("2010-01-01 00:00:00")), // == open instant → KEPT (>=)
    (2L, 100, Timestamp.valueOf("2009-12-31 23:59:59")), // before open → dropped
    (3L, 102, Timestamp.valueOf("2020-01-01 12:00:00")), // valid
    (4L, 101, Timestamp.valueOf("2020-01-01 12:00:00")), // account was dropped → orphan
    (5L, 999, Timestamp.valueOf("2020-01-01 12:00:00"))) // unknown account → orphan
    .toDF("TransactionID", "AccountID", "TransactionTimestamp")
    .selectExpr("TransactionID", "AccountID", "CAST(NULL AS STRING) AS MerchantName",
      "CAST(100.00 AS DECIMAL(18,2)) AS Amount", "TransactionTimestamp",
      "'Việt Nam' AS TransactionCountry", "'N' AS BeneficiaryName",
      "'tra no' AS TransactionDescription")

  test("P2: accounts opened on/before the birth date are dropped (strict >)") {
    val clean = BankEtl.cleanAccounts(accounts, customers)
    assert(clean.select("AccountID").as[Int].collect().sorted.toSeq == Seq(100, 102))
  }

  test("J2: customers without a surviving account are dropped") {
    val clean = BankEtl.cleanCustomers(customers, BankEtl.cleanAccounts(accounts, customers))
    assert(clean.select("CustomerID").as[Int].collect().sorted.toSeq == Seq(1, 2))
  }

  test("P4: transaction at the exact open instant is KEPT; earlier/orphans dropped") {
    val clean = BankEtl.cleanTransactions(transactions,
      BankEtl.cleanAccounts(accounts, customers))
    assert(clean.select("TransactionID").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("cleaned transactions keep the full 8-column P5 projection") {
    val clean = BankEtl.cleanTransactions(transactions,
      BankEtl.cleanAccounts(accounts, customers))
    assert(clean.columns.toSeq == Seq("TransactionID", "AccountID", "MerchantName",
      "Amount", "TransactionTimestamp", "TransactionCountry", "BeneficiaryName",
      "TransactionDescription"))
  }
}
