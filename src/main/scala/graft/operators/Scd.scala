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

  /** MERGE INTO-style transactional upsert with write-write conflict
    * detection — the lakehouse commit step on top of [[cdcApply]]'s
    * last-write-wins fold: two writers ('A', 'B') each submit a batch of
    * row-level writes (absolute-value upserts and delete tombstones,
    * every write stamped with a unique commit version) against the SAME
    * target snapshot. The merge (a) DETECTS conflicts at key granularity
    * — a key both writers touched, the check an optimistic-concurrency
    * committer runs before accepting the second writer — and (b)
    * RESOLVES every key deterministically by the highest commit version,
    * so the concurrent set-based apply is provably equivalent to
    * replaying all writes serially in version order. The oracle IS that
    * serial replay (row_number over version), making the hash-match a
    * serializability certificate.
    *
    * Plan shape: the per-key fold is ONE map-side-combinable aggregate
    * (`max(struct(version, op, cents))` — no window ever sorts the write
    * log, [[cdcApply]]'s scale argument) with the per-writer conditional
    * counts riding the same groupBy; the merge itself is one outer
    * equi-join between target and the folded writes. Writes derive
    * deterministically from orders: writer = orderkey parity, tombstones
    * every 7th orderkey, version = the unique orderkey.
    *
    * Output: one row per key in target ∪ writes — (key, n_writes_a,
    * n_writes_b, conflict, winner_version, final_state ∈
    * kept/updated/inserted/deleted, final_cents null when deleted).
    */
  def mergeUpsert(customer: DataFrame, orders: DataFrame): DataFrame = {
    import graft.functions.OracleSafe.quant
    val target = customer.select(col("c_custkey").as("key"),
      quant(col("c_acctbal"), 100).as("tcents"), lit(1).as("in_t"))
    val writes = orders.select(col("o_custkey").as("key"),
      when(col("o_orderkey") % 2 === 0, lit("A")).otherwise(lit("B")).as("writer"),
      when(col("o_orderkey") % 7 === 0, lit("D")).otherwise(lit("U")).as("op"),
      quant(col("o_totalprice"), 100).as("wcents"),
      col("o_orderkey").as("version"))
    val folded = writes.groupBy("key").agg(
      sum(when(col("writer") === "A", 1L).otherwise(0L)).as("n_writes_a"),
      sum(when(col("writer") === "B", 1L).otherwise(0L)).as("n_writes_b"),
      max(struct(col("version"), col("op"), col("wcents"))).as("w"))
    target.join(folded, Seq("key"), "full")
      .select(col("key"),
        coalesce(col("n_writes_a"), lit(0L)).as("n_writes_a"),
        coalesce(col("n_writes_b"), lit(0L)).as("n_writes_b"),
        (coalesce(col("n_writes_a"), lit(0L)) > 0 &&
          coalesce(col("n_writes_b"), lit(0L)) > 0).as("conflict"),
        col("w.version").as("winner_version"),
        when(col("w").isNull, lit("kept"))
          .when(col("w.op") === "D", lit("deleted"))
          .when(col("in_t").isNotNull, lit("updated"))
          .otherwise(lit("inserted")).as("final_state"),
        when(col("w").isNull, col("tcents"))
          .when(col("w.op") === "D", lit(null).cast("long"))
          .otherwise(col("w.wcents")).as("final_cents"))
      .orderBy("key")
  }

  /** DuckDB twin of [[mergeUpsert]] — the SERIAL replay on purpose: all
    * writes ordered by commit version, each key's last write applied on
    * top of the target (row_number formulation; the oracle need not
    * scale). Equality with the concurrent set-based merge is the
    * serializability proof. Embed after `WITH ` and select from
    * `merge_upsert`.
    */
  def mergeUpsertSql(): String = {
    import graft.functions.OracleSafe.quantSql
    s"""mu_target AS (
       |  SELECT c_custkey AS key, ${quantSql("c_acctbal", 100)} AS tcents
       |  FROM customer),
       |mu_writes AS (
       |  SELECT o_custkey AS key,
       |         CASE WHEN o_orderkey % 2 = 0 THEN 'A' ELSE 'B' END AS writer,
       |         CASE WHEN o_orderkey % 7 = 0 THEN 'D' ELSE 'U' END AS op,
       |         ${quantSql("o_totalprice", 100)} AS wcents,
       |         o_orderkey AS version
       |  FROM orders),
       |mu_serial AS (
       |  SELECT key, op, wcents, version FROM (
       |    SELECT *, ROW_NUMBER() OVER (PARTITION BY key
       |      ORDER BY version DESC) AS rn
       |    FROM mu_writes) t WHERE rn = 1),
       |mu_counts AS (
       |  SELECT key,
       |         CAST(SUM(CASE WHEN writer = 'A' THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_writes_a,
       |         CAST(SUM(CASE WHEN writer = 'B' THEN 1 ELSE 0 END) AS BIGINT)
       |           AS n_writes_b
       |  FROM mu_writes GROUP BY 1),
       |merge_upsert AS (
       |  SELECT COALESCE(t.key, s.key) AS key,
       |         COALESCE(s.n_writes_a, 0) AS n_writes_a,
       |         COALESCE(s.n_writes_b, 0) AS n_writes_b,
       |         COALESCE(s.n_writes_a, 0) > 0
       |           AND COALESCE(s.n_writes_b, 0) > 0 AS conflict,
       |         s.version AS winner_version,
       |         CASE WHEN s.key IS NULL THEN 'kept'
       |              WHEN s.op = 'D' THEN 'deleted'
       |              WHEN t.key IS NOT NULL THEN 'updated'
       |              ELSE 'inserted' END AS final_state,
       |         CASE WHEN s.key IS NULL THEN t.tcents
       |              WHEN s.op = 'D' THEN NULL
       |              ELSE s.wcents END AS final_cents
       |  FROM mu_target t
       |  FULL JOIN (SELECT * FROM mu_serial JOIN mu_counts USING (key)) s
       |    ON t.key = s.key)""".stripMargin
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

  /** q265 — POINT-IN-TIME join of a fact to its SCD2 dimension: every
    * order joins the dimension VERSION that was effective on its order
    * date (`effective_from ≤ d < effective_to`, open version = null to),
    * the lookup a type-2 dimension exists to serve and the one q69
    * (which only BUILDS the history) never exercises. Joining the open
    * version instead — the classic PIT bug — back-dates attribute
    * changes onto historical facts; the version split here is pinned so
    * the oracle catches exactly that: customers in the delta cohort
    * change nation at the cut date, and orders BEFORE the cut must
    * aggregate under the OLD nation.
    *
    * Scale shape: an equi-join on the natural key with the interval
    * predicate as a residual filter — per-key version counts are small
    * by construction in any real SCD2 (versions per key ≈ change count),
    * so the fan-out is bounded; the aggregate is map-side-combinable.
    * Coverage is measured, not assumed: the output totals sum to the
    * full order count, so a fact row matching zero or two versions
    * hash-mismatches the oracle.
    */
  def pointInTimeJoin(orders: DataFrame, customer: DataFrame,
      cutDate: String = "1998-01-01"): DataFrame = {
    import graft.functions.OracleSafe
    val cut = to_timestamp(lit(cutDate))
    val inCohort = col("c_custkey") % 4 === 0
    val v1 = customer.select(col("c_custkey").as("k"),
      col("c_nationkey").as("nation"),
      lit(null).cast("timestamp").as("eff_from"), // -inf: since first load
      when(inCohort, cut).otherwise(lit(null).cast("timestamp")).as("eff_to"),
      lit(1L).as("ver"))
    val v2 = customer.filter(inCohort).select(col("c_custkey").as("k"),
      ((col("c_nationkey") + 1) % 25).as("nation"),
      cut.as("eff_from"), lit(null).cast("timestamp").as("eff_to"),
      lit(2L).as("ver"))
    orders.join(v1.unionByName(v2), col("o_custkey") === col("k") &&
        (col("eff_from").isNull || col("o_orderdate") >= col("eff_from")) &&
        (col("eff_to").isNull || col("o_orderdate") < col("eff_to")))
      .groupBy("ver", "nation")
      .agg(count(lit(1)).as("n_orders"),
        sum(OracleSafe.quant(col("o_totalprice"), 100)).as("total_cents"))
      .orderBy("ver", "nation")
  }

  /** DuckDB twin of [[pointInTimeJoin]]; embed after `WITH ` and select
    * from `pit_join`.
    */
  def pointInTimeJoinSql(cutDate: String = "1998-01-01"): String =
    s"""pit_dim AS (
       |  SELECT c_custkey AS k, c_nationkey AS nation,
       |         NULL::TIMESTAMP AS eff_from,
       |         CASE WHEN c_custkey % 4 = 0 THEN TIMESTAMP '$cutDate' END
       |           AS eff_to,
       |         CAST(1 AS BIGINT) AS ver
       |  FROM customer
       |  UNION ALL
       |  SELECT c_custkey, (c_nationkey + 1) % 25, TIMESTAMP '$cutDate',
       |         NULL, 2
       |  FROM customer WHERE c_custkey % 4 = 0),
       |pit_join AS (
       |  SELECT ver, nation, COUNT(*) AS n_orders,
       |         CAST(SUM(${graft.functions.OracleSafe
                  .quantSql("o_totalprice", 100)}) AS BIGINT) AS total_cents
       |  FROM orders o JOIN pit_dim d
       |    ON o.o_custkey = d.k
       |   AND (d.eff_from IS NULL OR o.o_orderdate >= d.eff_from)
       |   AND (d.eff_to IS NULL OR o.o_orderdate < d.eff_to)
       |  GROUP BY 1, 2)""".stripMargin
}
