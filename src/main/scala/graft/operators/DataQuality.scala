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

  /** One row per dim: (display name, oracle CTE name, surrogate key).
    * [[checksDf]] and the DuckDB twin in BankOracle both iterate THIS list,
    * so the check set cannot drift between engine and oracle.
    */
  val dimKeys: Seq[(String, String, String)] = Seq(
    ("Dim_Date", "dim_date", "Date_Key"),
    ("Dim_Customer", "dim_customer", "Customer_Key"),
    ("Dim_Account", "dim_account", "Account_Key"),
    ("Dim_Merchant", "dim_merchant", "Merchant_Key"),
    ("Dim_Location", "dim_location", "Location_Key"))

  /** All FK/PK checks as ONE lazy DataFrame of (check_name, violations):
    * every fact key resolves (anti-join counts) and dim keys are unique
    * (count − count-distinct). Each branch is a distributed aggregate over
    * a pruned single-column projection, so the whole sweep is a handful of
    * shuffle-light jobs even on a 100 TB fact.
    */
  def checksDf(w: BankEtl.Warehouse): DataFrame = {
    val branches = dimKeys.flatMap { case (name, _, key) =>
      val dim = w.tables(name)
      Seq(
        w.fact.join(dim.select(col(key)), Seq(key), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(s"fact.$key orphans").as("check_name"), col("violations")),
        dim.agg((count(col(key)) - countDistinct(col(key))).as("violations"))
          .select(lit(s"$name dup keys").as("check_name"), col("violations")))
    }
    branches.reduce(_.unionByName(_)).orderBy("check_name")
  }

  /** FK checks: every fact key resolves; PK checks: dim keys unique. */
  def warehouseChecks(w: BankEtl.Warehouse): Seq[Violations] =
    checksDf(w).collect().toSeq
      .map(r => Violations(r.getString(0), r.getLong(1)))

  def assertClean(w: BankEtl.Warehouse): Unit = {
    val bad = warehouseChecks(w).filter(_.count > 0)
    require(bad.isEmpty, s"constraint violations: ${bad.mkString(", ")}")
  }
}
