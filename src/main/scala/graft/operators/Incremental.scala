package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.OracleSafe

/** Incremental materialized-view maintenance — the pattern that keeps a
  * 100 TB warehouse's aggregates fresh without nightly full recomputes
  * (the reference truncates-and-reloads, `etl.py:316-321`; at scale the
  * rebuild IS the bottleneck). A distributive aggregate (count, sum) over
  * `base ∪ delta` equals the aggregate of `agg(base) ∪ agg(delta)`
  * re-aggregated — so maintaining the view costs one pass over the DELTA
  * plus a merge proportional to the VIEW size (groups), never a re-read
  * of the base data.
  *
  * Correctness is the algebraic identity, and the oracle twin checks it:
  * the query computes merge(agg(base), agg(delta)); the oracle aggregates
  * the full input directly. Money rides the exact DECIMAL(18,2) grid so
  * the split point can't perturb sums.
  */
object Incremental {

  private def ym(d: Column): Column =
    (year(d) * 100 + month(d)).cast("int")

  /** Monthly order rollup (ym, n_orders, total) maintained incrementally:
    * `base` = rows strictly before `splitDate` (the materialized history),
    * `delta` = rows at-or-after (the new batch).
    */
  def monthlyOrdersMerged(orders: DataFrame, splitDate: String): DataFrame = {
    val split = lit(splitDate).cast("timestamp_ntz")
    def rollup(part: DataFrame): DataFrame =
      part.groupBy(ym(col("o_orderdate")).as("ym"))
        .agg(count(lit(1)).as("n_orders"),
          sum(OracleSafe.money(col("o_totalprice"))).cast("decimal(18,2)").as("total_q"))
    val mv = rollup(orders.filter(col("o_orderdate") < split))
    val deltaAgg = rollup(orders.filter(col("o_orderdate") >= split))
    mv.unionByName(deltaAgg)
      .groupBy("ym")
      .agg(sum(col("n_orders")).as("n_orders"),
        sum(col("total_q")).cast("decimal(18,2)").as("total_q"))
      .select(col("ym"), col("n_orders"), OracleSafe.moneyOut(col("total_q")).as("total"))
  }

  /** DuckDB twin: the FULL recompute — the identity the merge must hit. */
  val monthlyOrdersFullSql: String =
    s"""SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate) AS INT) AS ym,
       |       COUNT(*) AS n_orders,
       |       ${OracleSafe.moneyOutSql(s"CAST(SUM(${OracleSafe.moneySql("o_totalprice")}) AS DECIMAL(18,2))")} AS total
       |FROM orders
       |GROUP BY ym""".stripMargin
}
