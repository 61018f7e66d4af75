package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-addressed snapshot diffing — the incremental-pipeline primitive
  * behind q71's ingestion dedup: two crawl snapshots of a corpus are
  * compared by 16-byte text fingerprint, never by text, so the diff costs
  * one hash-partitioned full join on the document key with md5-width rows.
  * At 100 TB the snapshots are fingerprint manifests (id, source, fp) a
  * tiny fraction of corpus size, and the report drives what re-processes:
  * `added`/`changed` re-embed and re-dedup, `removed` tombstones, and
  * `unchanged` (the overwhelming bulk) is never touched.
  *
  * The harness ships one `documents` table, so [[snapshots]] derives two
  * deterministic pseudo-snapshots from it with the engine's standard
  * md5-coin construction (salted per decision, reproducible in DuckDB):
  * each snapshot keeps 95% of docs (different salts → ~90% overlap) and
  * the second revises ~10% of its text — giving the diff all four statuses
  * to classify.
  */
object Snapshot {

  /** Salted per-doc coin on [0, 100) — [[Sampling]]'s construction with a
    * decision-name salt, identical in DuckDB (see [[coinSql]]).
    */
  private def coin(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 12), 16, 10)
      .cast("long") % 100

  private def coinSql(id: String, salt: String): String =
    s"('0x' || substring(md5(CAST($id AS VARCHAR) || '$salt'), 1, 12))::BIGINT % 100"

  /** The two derived pseudo-snapshots (old, new). */
  def snapshots(docs: DataFrame): (DataFrame, DataFrame) = {
    val a = docs.filter(coin(col("doc_id"), "snapA") < 95)
    val b = docs.filter(coin(col("doc_id"), "snapB") < 95)
      .withColumn("text",
        when(coin(col("doc_id"), "edit") < 10, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")))
    (a, b)
  }

  /** Fingerprint diff of two snapshots: per (source, status) counts with
    * status ∈ added / removed / changed / unchanged.
    */
  def diff(a: DataFrame, b: DataFrame): DataFrame = {
    val fa = a.select(col("doc_id"), col("source").as("src_a"), md5(col("text")).as("fp_a"))
    val fb = b.select(col("doc_id"), col("source").as("src_b"), md5(col("text")).as("fp_b"))
    fa.join(fb, Seq("doc_id"), "full")
      .select(coalesce(col("src_a"), col("src_b")).as("source"),
        when(col("fp_a").isNull, "added")
          .when(col("fp_b").isNull, "removed")
          .when(col("fp_a") =!= col("fp_b"), "changed")
          .otherwise("unchanged").as("status"))
      .groupBy("source", "status").agg(count(lit(1)).as("n"))
  }

  /** DuckDB twin of [[diff]] over [[snapshots]]; embed after `WITH` and
    * select from `snapshot_diff`.
    */
  val diffSql: String =
    s"""sd_a AS (
       |  SELECT doc_id, source, md5(text) AS fp FROM documents
       |  WHERE ${coinSql("doc_id", "snapA")} < 95),
       |sd_b AS (
       |  SELECT doc_id, source,
       |         md5(CASE WHEN ${coinSql("doc_id", "edit")} < 10
       |                  THEN text || ' [rev2]' ELSE text END) AS fp
       |  FROM documents
       |  WHERE ${coinSql("doc_id", "snapB")} < 95),
       |snapshot_diff AS (
       |  SELECT COALESCE(a.source, b.source) AS source,
       |         CASE WHEN a.fp IS NULL THEN 'added'
       |              WHEN b.fp IS NULL THEN 'removed'
       |              WHEN a.fp <> b.fp THEN 'changed'
       |              ELSE 'unchanged' END AS status,
       |         COUNT(*) AS n
       |  FROM sd_a a FULL JOIN sd_b b USING (doc_id)
       |  GROUP BY 1, 2)""".stripMargin
}
