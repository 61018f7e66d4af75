package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Constraint validation — the engine's substitute for the reference's SQL
  * Server PK/FK constraints (`schema.sql:130-134`; SURVEY.md §7.4-8).
  * Each check is an anti-join / aggregation returning VIOLATION COUNTS, so
  * a pipeline can assert emptiness cheaply after a build.
  */
object DataQuality {

  final case class Violations(check: String, count: Long)

  /** FK checks: every fact key resolves; PK checks: dim keys unique. */
  def warehouseChecks(w: BankEtl.Warehouse): Seq[Violations] = {
    def orphans(dim: DataFrame, key: String): Long =
      w.fact.join(dim, Seq(key), "left_anti").count()
    def dupKeys(dim: DataFrame, key: String): Long = {
      val r = dim.agg(count(col(key)).as("n"), countDistinct(col(key)).as("d")).head()
      r.getLong(0) - r.getLong(1)
    }
    Seq(
      Violations("fact.Customer_Key orphans", orphans(w.dimCustomer, "Customer_Key")),
      Violations("fact.Account_Key orphans", orphans(w.dimAccount, "Account_Key")),
      Violations("fact.Merchant_Key orphans", orphans(w.dimMerchant, "Merchant_Key")),
      Violations("fact.Location_Key orphans", orphans(w.dimLocation, "Location_Key")),
      Violations("fact.Date_Key orphans", orphans(w.dimDate, "Date_Key")),
      Violations("Dim_Customer dup keys", dupKeys(w.dimCustomer, "Customer_Key")),
      Violations("Dim_Account dup keys", dupKeys(w.dimAccount, "Account_Key")),
      Violations("Dim_Merchant dup keys", dupKeys(w.dimMerchant, "Merchant_Key")),
      Violations("Dim_Location dup keys", dupKeys(w.dimLocation, "Location_Key")),
      Violations("Dim_Date dup keys", dupKeys(w.dimDate, "Date_Key")))
  }

  def assertClean(w: BankEtl.Warehouse): Unit = {
    val bad = warehouseChecks(w).filter(_.count > 0)
    require(bad.isEmpty, s"constraint violations: ${bad.mkString(", ")}")
  }
}
