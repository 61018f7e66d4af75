package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.OracleSafe

/** Customer segmentation — the RFM (recency / frequency / monetary) decile
  * analysis every bank-marketing warehouse runs on its fact table (the
  * reference's dashboard slices by age group, `dashboard.py:110-129`; RFM is
  * the same shape over behaviour instead of demographics).
  *
  * The scale problem is NTILE: `ntile(10).over(Window.orderBy(...))` is a
  * GLOBAL window — Spark collapses the whole frame into a single partition
  * to rank it, which at 100 TB (or even 100 GB) is the job-killer the
  * surrogate-key design already routes around. This operator computes the
  * IDENTICAL bucket assignment window-free:
  *
  *  1. aggregate the fact to one row per customer (shuffle on custkey —
  *     partial-aggregatable, the only data-sized shuffle here);
  *  2. global rank via [[SurrogateKeys.dense]] — range-repartition on the
  *     ordering key + per-partition sort + zipWithIndex, full parallelism;
  *  3. NTILE arithmetic from (rank, n): with base = n div k and
  *     rem = n mod k, the first `rem` buckets hold base+1 rows, so
  *     rank r maps to bucket
  *       (r-1) div (base+1) + 1                       if r ≤ rem·(base+1)
  *       rem + (r - rem·(base+1) - 1) div base + 1    otherwise
  *     — exactly SQL NTILE's row distribution (ISO/IEC 9075; DuckDB and
  *     Spark both implement it), all-integer, oracle-exact.
  *
  * `n` rides in on a broadcast of a 1-row count aggregate (the
  * [[Similarity]] params pattern), so nothing touches the driver.
  */
object Segmentation {

  /** Floor division for the NTILE arithmetic: operands here are positive
    * (ranks, bucket sizes), [[OracleSafe.intDiv]] keeps the two engines'
    * semantics aligned anyway. Divisor guarded to ≥1: when n < k the first
    * NTILE branch covers every rank and base = 0 would only appear in the
    * never-taken else branch (CaseWhen evaluates lazily, but ANSI mode
    * makes defensive guarding cheap insurance against a plan rewrite).
    */
  private def ntileOf(rank: Column, n: Column, k: Int): Column = {
    val base = OracleSafe.intDiv(n, lit(k))
    val rem = n % lit(k)
    val fat = base + lit(1L) // bucket size in the first `rem` buckets
    val cut = rem * fat // ranks 1..cut land in the fat buckets
    when(rank <= cut, OracleSafe.intDiv(rank - 1, fat) + 1)
      .otherwise(rem + OracleSafe.intDiv(rank - cut - 1, greatest(base, lit(1L))) + 1)
      .cast("int")
  }

  /** SQL twin of [[ntileOf]] — same arithmetic; the oracle uses DuckDB's
    * native NTILE instead (single node, a window is fine there), this twin
    * exists for tests that want the formula itself cross-checked.
    */
  def ntileSql(rank: String, n: String, k: Int): String = {
    val base = s"(($n) // $k)"
    val rem = s"(($n) % $k)"
    val cut = s"($rem * ($base + 1))"
    s"""CAST(CASE WHEN ($rank) <= $cut THEN (($rank) - 1) // ($base + 1) + 1
       |          ELSE $rem + (($rank) - $cut - 1) // GREATEST($base, 1) + 1 END AS INT)""".stripMargin
  }

  /** Per-customer RFM metrics + monetary decile (1 = highest spend).
    * Input: TPC-H-shaped orders. Output one row per customer:
    * (custkey, recency = last order date, frequency = order count,
    *  monetary = total spend, m_decile).
    */
  def rfmDeciles(orders: DataFrame, k: Int = 10): DataFrame = {
    val rfm = orders.groupBy(col("o_custkey").as("custkey"))
      .agg(max(col("o_orderdate")).as("recency"),
        count(lit(1)).as("frequency"),
        sum(OracleSafe.money(col("o_totalprice"))).cast("decimal(18,2)").as("monetary_q"))
    // rank 1 = biggest spender; custkey breaks ties → total order, so the
    // assignment equals ROW_NUMBER/NTILE over the same ORDER BY exactly.
    val ranked = SurrogateKeys.dense(rfm, "rank", negate(col("monetary_q")), col("custkey"))
    val n = rfm.agg(count(lit(1)).as("n"))
    ranked.crossJoin(broadcast(n))
      .select(col("custkey"), col("recency"), col("frequency"),
        OracleSafe.moneyOut(col("monetary_q")).as("monetary"),
        ntileOf(col("rank"), col("n"), k).as("m_decile"))
  }

  /** DuckDB oracle for [[rfmDeciles]] — native NTILE over the identical
    * total order (single-node, the window is the right tool there).
    */
  def rfmDecilesSql(k: Int = 10): String =
    s"""rfm AS (
       |  SELECT o_custkey AS custkey,
       |         MAX(o_orderdate) AS recency,
       |         COUNT(*) AS frequency,
       |         CAST(SUM(${OracleSafe.moneySql("o_totalprice")}) AS DECIMAL(18,2)) AS monetary_q
       |  FROM orders GROUP BY o_custkey)
       |SELECT custkey, recency, frequency,
       |       ${OracleSafe.moneyOutSql("monetary_q")} AS monetary,
       |       CAST(NTILE($k) OVER (ORDER BY monetary_q DESC, custkey) AS INT) AS m_decile
       |FROM rfm""".stripMargin
}
