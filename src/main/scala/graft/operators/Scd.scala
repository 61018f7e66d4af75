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
}
