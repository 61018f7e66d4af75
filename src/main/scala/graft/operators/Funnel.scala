package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.OracleSafe

/** Ordered-funnel and cohort-retention analytics over the event stream —
  * the two product-analytics queries every warehouse dashboard grows next
  * to the spend trends the reference ships (`dashboard.py:34-67` slices
  * by month/category/age; funnels and retention slice by *behavioural
  * sequence*).
  *
  * Scale shapes:
  *  - [[funnel]] is k−1 co-partitioned join+aggregate steps on `user_id`
  *    (each stage's reach frame only shrinks), NOT a per-user
  *    `collect_list` sort — per-user state never materializes, so a
  *    power user with 10⁷ events costs the same as anyone else. All k
  *    stage frames hash-partition on the same key, so after the first
  *    aggregate the joins reuse the exchange.
  *  - [[retention]] is two aggregates and one co-partitioned join; the
  *    output is bounded by cohorts × horizon, independent of event count.
  *
  * Time arithmetic runs on integer epoch-milliseconds from the exact
  * nanosecond column (`ts_ns DIV 1e6`), the same engine-precision-proof
  * convention as [[Events]].
  */
object Funnel {

  private val msCol = expr("ts_ns DIV 1000000")

  /** Sequenced funnel: a user "reaches" stage i at the earliest stage-i
    * event at-or-after the moment they reached stage i−1 (the strict
    * ordered-funnel semantics — a purchase BEFORE the first view does not
    * count as conversion). Emits one row per stage:
    * (stage_idx, stage, n_users).
    */
  def funnel(events: DataFrame,
      stages: Seq[String] = Seq("view", "click", "purchase")): DataFrame = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"funnel stages must be non-empty and distinct: $stages")
    val ms = events.withColumn("ms", msCol)
    val first = ms.filter(col("event_type") === stages.head)
      .groupBy("user_id").agg(min("ms").as("t"))
    // reach(i) = earliest stage-i event >= reach(i-1), per user
    val reach = stages.tail.scanLeft(first) { (prev, st) =>
      ms.filter(col("event_type") === st).as("e")
        .join(prev.as("p"), col("e.user_id") === col("p.user_id"))
        .filter(col("e.ms") >= col("p.t"))
        .select(col("e.user_id").as("user_id"), col("e.ms").as("ms"))
        .groupBy("user_id").agg(min("ms").as("t"))
    }
    reach.zip(stages).zipWithIndex.map { case ((df, st), i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("stage_idx"), lit(st).as("stage"), col("n_users"))
    }.reduce(_ unionByName _)
  }

  /** DuckDB twin of [[funnel]] — the same stage-by-stage reach CTEs. */
  def funnelSql(stages: Seq[String] = Seq("view", "click", "purchase")): String = {
    def esc(s: String) = s.replace("'", "''")
    val ctes = stages.zipWithIndex.map { case (st, i) =>
      if (i == 0)
        s"""s0 AS (
           |  SELECT user_id, min(epoch_ms(ts)) AS t FROM events
           |  WHERE event_type = '${esc(st)}' GROUP BY user_id)""".stripMargin
      else
        s"""s$i AS (
           |  SELECT e.user_id, min(epoch_ms(e.ts)) AS t
           |  FROM events e JOIN s${i - 1} p ON e.user_id = p.user_id
           |  WHERE e.event_type = '${esc(st)}' AND epoch_ms(e.ts) >= p.t
           |  GROUP BY e.user_id)""".stripMargin
    }
    val rows = stages.zipWithIndex.map { case (st, i) =>
      s"SELECT ${i + 1} AS stage_idx, '${esc(st)}' AS stage, (SELECT count(*) FROM s$i) AS n_users"
    }
    s"""WITH ${ctes.mkString(",\n")}
       |${rows.mkString("\nUNION ALL\n")}""".stripMargin
  }

  private val weekMs = 604800000L

  /** Weekly cohort retention: cohort = epoch-week of the user's FIRST
    * event; a user counts toward (cohort_week, week_offset) iff they have
    * any event in that later week. Long-form retention triangle:
    * (cohort_week, week_offset, n_users).
    */
  def retention(events: DataFrame): DataFrame = {
    val ms = events.withColumn("ms", msCol)
    val cohorts = ms.groupBy("user_id").agg(min("ms").as("first_ms"))
      .select(col("user_id"),
        OracleSafe.intDiv(col("first_ms"), lit(weekMs)).as("cohort_week"))
    val active = ms
      .select(col("user_id"), OracleSafe.intDiv(col("ms"), lit(weekMs)).as("week"))
      .distinct()
    active.join(cohorts, Seq("user_id"))
      .withColumn("week_offset", col("week") - col("cohort_week"))
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** First-touch channel attribution: each user's acquisition channel is
    * the `event_type` of their earliest event (total order: (ms, event_id)
    * — event ids are unique, so min_by is deterministic), and every dollar
    * of their `purchase` spend attributes to that channel. Emits one row
    * per channel: (channel, n_users, n_buyers, revenue).
    *
    * Scale shape: two aggregates hash-partitioned on `user_id` (the join
    * between them reuses the exchange), then a channel-cardinality
    * aggregate. The first-touch pick is a `min_by` AGGREGATE, not a
    * row_number window — no per-user sort materializes. Money runs on the
    * exact cent grid ([[graft.functions.OracleSafe.money]]).
    */
  def attribution(events: DataFrame, purchase: String = "purchase"): DataFrame = {
    val ms = events.withColumn("ms", msCol)
    val first = ms.groupBy("user_id")
      .agg(min_by(col("event_type"), struct(col("ms"), col("event_id")))
        .as("channel"))
    val spend = ms.filter(col("event_type") === lit(purchase))
      .groupBy("user_id")
      .agg(sum(OracleSafe.money(col("value"))).cast("decimal(18,2)").as("rev"))
    first.join(spend, Seq("user_id"), "left")
      .groupBy("channel")
      .agg(count(lit(1)).as("n_users"),
        count(col("rev")).as("n_buyers"),
        OracleSafe.moneyOut(coalesce(sum(col("rev")).cast("decimal(18,2)"),
          lit(0).cast("decimal(18,2)"))).as("revenue"))
  }

  /** DuckDB twin of [[attribution]] — row_number picks the same
    * (ms, event_id)-minimal event the engine's min_by struct does.
    */
  def attributionSql(purchase: String = "purchase"): String = {
    val p = purchase.replace("'", "''")
    s"""WITH first_touch AS (
       |  SELECT user_id, event_type AS channel
       |  FROM (SELECT user_id, event_type,
       |               ROW_NUMBER() OVER (PARTITION BY user_id
       |                                  ORDER BY epoch_ms(ts), event_id) AS rn
       |        FROM events) r WHERE rn = 1),
       |spend AS (
       |  SELECT user_id, CAST(SUM(${OracleSafe.moneySql("value")}) AS DECIMAL(18,2)) AS rev
       |  FROM events WHERE event_type = '$p' GROUP BY user_id)
       |SELECT channel, COUNT(*) AS n_users, COUNT(s.rev) AS n_buyers,
       |       ${OracleSafe.moneyOutSql(
                  "COALESCE(CAST(SUM(s.rev) AS DECIMAL(18,2)), CAST(0 AS DECIMAL(18,2)))")} AS revenue
       |FROM first_touch f LEFT JOIN spend s USING (user_id)
       |GROUP BY channel""".stripMargin
  }

  /** DuckDB twin of [[retention]]. `count(*)` equals Spark's
    * `count(user_id)` here because the (user, week) frame is distinct
    * before the join.
    */
  val retentionSql: String = {
    val cohortDiv = OracleSafe.intDivSql("min(epoch_ms(ts))", weekMs.toString)
    val weekDiv = OracleSafe.intDivSql("epoch_ms(ts)", weekMs.toString)
    s"""WITH cohorts AS (
       |  SELECT user_id, $cohortDiv AS cohort_week
       |  FROM events GROUP BY user_id),
       |active AS (
       |  SELECT DISTINCT user_id, $weekDiv AS week FROM events)
       |SELECT cohort_week, week - cohort_week AS week_offset, count(*) AS n_users
       |FROM active JOIN cohorts USING (user_id)
       |GROUP BY cohort_week, week_offset""".stripMargin
  }
}
