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

  /** q267 — recency-DECAYED user value ranking: each user's spend scored
    * with an exponential half-life (one halving per day of age), the
    * recency×monetary blend RFM quantizes into deciles made continuous.
    * The decay is EXACT integer arithmetic: with ages bounded to the
    * last `horizon` days, weight(age) = 2^(horizon−1−age), so the score
    * is a BIGINT sum of shifted cents — no pow(), no float accumulation,
    * and events older than the horizon carry weight 0 (fully decayed,
    * the same cutoff a serving system applies so its state stays
    * bounded). Output: top `k` users by decayed score, id tie-break.
    *
    * Scale shape: one map-side-combinable aggregate to the (user, age)
    * grain, one weighted fold per user, then TakeOrderedAndProject for
    * the top-k — never a global sort. The shifted sum needs
    * cents·2^(horizon−1) per (user, day) to stay under 2^63: horizon 16
    * leaves 2^47 ≈ $1.4T per user-day, plenty; a wider horizon trades
    * into the double path.
    */
  def decayedValueRank(events: DataFrame, horizon: Int = 16,
      k: Int = 10): DataFrame = {
    require(horizon >= 1 && horizon <= 31, s"horizon in [1,31], got $horizon")
    val day = OracleSafe.intDiv(expr("ts_ns DIV 1000000"), lit(86400000L))
    val perDay = events
      .select(col("user_id"), day.as("d"),
        OracleSafe.quant(col("value"), 100).as("cents"))
      .groupBy("user_id", "d").agg(sum("cents").as("dc"))
    val maxDay = perDay.agg(max("d").as("dmax"))
    perDay.crossJoin(broadcast(maxDay))
      .withColumn("age", col("dmax") - col("d"))
      .filter(col("age") < horizon)
      .groupBy("user_id")
      .agg(sum(col("dc") * call_function("shiftleft", // 2^(horizon-1-age)
          lit(1L), (lit(horizon - 1) - col("age")).cast("int")))
        .as("decayed_scaled"),
        sum("dc").as("raw_cents"), count(lit(1)).as("active_days"))
      .orderBy(col("decayed_scaled").desc, col("user_id"))
      .limit(k)
  }

  /** DuckDB twin of [[decayedValueRank]]; embed after `WITH ` and select
    * from `decayed_rank`.
    */
  def decayedValueRankSql(horizon: Int = 16, k: Int = 10): String = {
    val day = OracleSafe.intDivSql("epoch_ms(ts)", "86400000")
    s"""dvr_day AS (
       |  SELECT user_id, $day AS d,
       |         CAST(SUM(${OracleSafe.quantSql("value", 100)}) AS BIGINT)
       |           AS dc
       |  FROM events GROUP BY 1, 2),
       |dvr_max AS (SELECT MAX(d) AS dmax FROM dvr_day),
       |decayed_rank AS (
       |  SELECT user_id,
       |         CAST(SUM(dc * (CAST(1 AS BIGINT)
       |             << (${horizon - 1} - (dmax - d)))) AS BIGINT)
       |           AS decayed_scaled,
       |         CAST(SUM(dc) AS BIGINT) AS raw_cents,
       |         COUNT(*) AS active_days
       |  FROM dvr_day, dvr_max
       |  WHERE dmax - d < $horizon
       |  GROUP BY user_id
       |  ORDER BY decayed_scaled DESC, user_id
       |  LIMIT $k)""".stripMargin
  }
}
