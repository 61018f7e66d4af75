package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension maintenance, type 2: history is preserved by
  * closing the current version of a changed row and appending the new one.
  * The reference truncates-and-reloads its dimensions (`schema.sql:61-68`);
  * a warehouse ingesting deltas at scale needs merge semantics instead.
  *
  * Pure DataFrame formulation (no MERGE-capable table format required):
  * one shuffle on the natural key, change detection by comparing tracked
  * attributes, output = untouched rows ∪ closed rows ∪ new versions.
  */
object Scd {

  /** @param dim      current dimension: naturalKey, tracked..., effective_from,
    *                 effective_to (null = open)
    * @param updates  incoming snapshot rows: naturalKey, tracked...
    * @param asOfDate batch date stamped on closes/opens
    */
  def type2(dim: DataFrame, updates: DataFrame, naturalKey: String,
      tracked: Seq[String], asOfDate: Column): DataFrame = {
    val open = dim.filter(col("effective_to").isNull)
    val closed = dim.filter(col("effective_to").isNotNull)

    val changeCond = tracked
      .map(c => !(col(s"cur.$c") <=> col(s"upd.$c")))
      .reduce(_ || _)

    val joined = open.as("cur")
      .join(updates.as("upd"), col(s"cur.$naturalKey") === col(s"upd.$naturalKey"), "full")

    // unchanged or update-absent → keep the open row as is
    val keep = joined
      .filter(col(s"cur.$naturalKey").isNotNull &&
        (col(s"upd.$naturalKey").isNull || !changeCond))
      .select("cur.*")

    // changed → close the current version at asOfDate
    val close = joined
      .filter(col(s"cur.$naturalKey").isNotNull && col(s"upd.$naturalKey").isNotNull && changeCond)
      .select("cur.*")
      .withColumn("effective_to", asOfDate)

    // changed or brand-new → open a new version
    val openNew = joined
      .filter(col(s"upd.$naturalKey").isNotNull &&
        (col(s"cur.$naturalKey").isNull || changeCond))
      .select((naturalKey +: tracked).map(c => col(s"upd.$c")): _*)
      .withColumn("effective_from", asOfDate)
      .withColumn("effective_to", lit(null).cast("date"))

    closed.unionByName(keep).unionByName(close).unionByName(openNew)
  }

  /** Change-data-capture DETECTION: classify every key across two
    * snapshots as insert / update / delete (unchanged rows are dropped —
    * at scale they are the overwhelming majority and downstream consumers
    * only want the delta). One full-outer join on the key, null-safe
    * attribute compare — the read side of the merge [[type2]] applies.
    * Output: (key, change_type) plus the new-side tracked values
    * (null for deletes).
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, key: String,
      tracked: Seq[String]): DataFrame = {
    val cols = key +: tracked
    val o = oldSnap.select(cols.map(col): _*).as("o")
    val n = newSnap.select(cols.map(col): _*).as("n")
    val changed = tracked.map(c => !(col(s"o.$c") <=> col(s"n.$c"))).reduce(_ || _)
    o.join(n, col(s"o.$key") === col(s"n.$key"), "full")
      .withColumn("change_type",
        when(col(s"o.$key").isNull, lit("insert"))
          .when(col(s"n.$key").isNull, lit("delete"))
          .when(changed, lit("update")))
      .filter(col("change_type").isNotNull)
      .select(coalesce(col(s"o.$key"), col(s"n.$key")).as(key) +:
        col("change_type") +: tracked.map(c => col(s"n.$c")): _*)
  }

  /** CDC apply: fold an insert/update/delete change log into final table
    * state — last-write-wins per key with tombstone semantics (a trailing
    * delete erases the row; any later upsert resurrects it). This is the
    * MERGE-INTO/compaction kernel of every CDC-fed lakehouse table, here
    * as a pure DataFrame op: the event stream stands in for the change
    * log (`signup` → insert, `error` → delete tombstone, everything else
    * → upsert), ordered by (ts, event_id) — the event id breaks timestamp
    * ties deterministically.
    *
    * Plan shape: ONE map-side-combinable aggregate — `max(struct(ts,
    * event_id, op, value))` picks the winning write lexicographically
    * (ts first, unique id tiebreak; the trailing fields ride along and
    * are never compared), so there is no window, no sort, and no second
    * shuffle: the op-count and the winner come out of the same groupBy.
    * At 100 TB this is the shape that matters — a row_number window over
    * the raw log would sort every partition; the struct-max partials
    * keep only one candidate row per key per partition.
    *
    * Output: one row per key ever touched — (user_id, n_ops, last_op,
    * deleted 0/1, final_value null when deleted).
    */
  def cdcApply(events: DataFrame): DataFrame = {
    import graft.functions.OracleSafe.{money, moneyOut}
    val ops = events.select(col("user_id"), col("ts"), col("event_id"),
      when(col("event_type") === "signup", lit("I"))
        .when(col("event_type") === "error", lit("D"))
        .otherwise(lit("U")).as("op"),
      money(col("value")).as("val"))
    ops.groupBy("user_id")
      .agg(count(lit(1)).as("n_ops"),
        max(struct(col("ts"), col("event_id"), col("op"), col("val"))).as("last"))
      .select(col("user_id"), col("n_ops"),
        col("last.op").as("last_op"),
        (col("last.op") === "D").cast("int").as("deleted"),
        when(col("last.op") =!= "D", moneyOut(col("last.val"))).as("final_value"))
      .orderBy("user_id")
  }

  /** DuckDB twin of [[cdcApply]] — row_number formulation (the oracle
    * need not scale) with the identical (ts, event_id) write order.
    */
  def cdcApplySql(): String = {
    import graft.functions.OracleSafe.{moneyOutSql, moneySql}
    s"""cdc_ops AS (
       |  SELECT user_id, ts, event_id,
       |         CASE WHEN event_type = 'signup' THEN 'I'
       |              WHEN event_type = 'error' THEN 'D'
       |              ELSE 'U' END AS op,
       |         ${moneySql("value")} AS val
       |  FROM events),
       |cdc_last AS (
       |  SELECT user_id, op, val FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
       |      ORDER BY ts DESC, event_id DESC) AS rn FROM cdc_ops) t
       |  WHERE rn = 1),
       |cdc_n AS (SELECT user_id, COUNT(*) AS n_ops FROM cdc_ops GROUP BY 1),
       |cdc_apply AS (
       |  SELECT user_id, n_ops, op AS last_op,
       |         CAST(op = 'D' AS INT) AS deleted,
       |         CASE WHEN op <> 'D' THEN ${moneyOutSql("val")} END AS final_value
       |  FROM cdc_last JOIN cdc_n USING (user_id))""".stripMargin
  }
}
