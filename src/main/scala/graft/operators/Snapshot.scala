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

  /** Distribution drift between two snapshots, per source — the "did the
    * new crawl change what the data LOOKS like" check that gates a
    * retrain, beyond q156's "which rows changed". Documents bucket by
    * length (`n_chars DIV bucketWidth`); the per-source drift is the L1
    * distance between the two bucket distributions, computed as
    * Σ_buckets |na·Nb − nb·Na| in exact BIGINTs with ONE double division
    * by Na·Nb at the end — no per-bucket float ratios whose summation
    * order could differ across engines, and no log() (libm last-ulp
    * differences), which is why this is L1 and not PSI/KL. Range [0, 2]:
    * 0 = identical shape, 2 = disjoint support.
    *
    * Scale shape: two bucket-grain aggregates (map-side combinable, keys
    * bounded by source × bucket domain) and a bucket-grain full join —
    * corpus rows are touched once each, everything downstream is
    * histogram-sized.
    */
  def histogramDrift(a: DataFrame, b: DataFrame, bucketWidth: Int = 100): DataFrame = {
    require(bucketWidth >= 1, s"bucketWidth must be >= 1, got $bucketWidth")
    def hist(df: DataFrame, n: String) = df
      .groupBy(col("source"), expr(s"n_chars DIV $bucketWidth").as("bucket"))
      .agg(count(lit(1)).as(n))
    def tot(h: DataFrame, n: String, out: String) =
      h.groupBy("source").agg(sum(n).as(out))
    val ha = hist(a, "na"); val hb = hist(b, "nb")
    val joined = ha.join(hb, Seq("source", "bucket"), "full")
      .select(col("source"), col("bucket"),
        coalesce(col("na"), lit(0L)).as("na"), coalesce(col("nb"), lit(0L)).as("nb"))
    joined
      .join(broadcast(tot(ha, "na", "tot_a")), Seq("source"))
      .join(broadcast(tot(hb, "nb", "tot_b")), Seq("source"))
      .groupBy(col("source"), col("tot_a"), col("tot_b"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(abs(col("na") * col("tot_b") - col("nb") * col("tot_a"))).as("l1_num"))
      .select(col("source"), col("n_buckets"), col("tot_a"), col("tot_b"),
        (col("l1_num").cast("double")
          / (col("tot_a") * col("tot_b")).cast("double")).as("drift_l1"))
  }

  /** DuckDB twin of [[histogramDrift]] over [[snapshots]]; embed after
    * `WITH` (requires `sd_full_a`/`sd_full_b` — see [[driftSql]]).
    */
  def driftSql(bucketWidth: Int = 100): String =
    s"""dr_a AS (
       |  SELECT source, n_chars // $bucketWidth AS bucket, COUNT(*) AS na
       |  FROM documents WHERE ${coinSql("doc_id", "snapA")} < 95
       |  GROUP BY 1, 2),
       |dr_b AS (
       |  SELECT source, n_chars // $bucketWidth AS bucket, COUNT(*) AS nb
       |  FROM documents WHERE ${coinSql("doc_id", "snapB")} < 95
       |  GROUP BY 1, 2),
       |dr_ta AS (SELECT source, CAST(SUM(na) AS BIGINT) AS tot_a FROM dr_a GROUP BY source),
       |dr_tb AS (SELECT source, CAST(SUM(nb) AS BIGINT) AS tot_b FROM dr_b GROUP BY source),
       |dr_j AS (
       |  SELECT COALESCE(a.source, b.source) AS source,
       |         COALESCE(a.bucket, b.bucket) AS bucket,
       |         COALESCE(a.na, 0) AS na, COALESCE(b.nb, 0) AS nb
       |  FROM dr_a a FULL JOIN dr_b b
       |    ON a.source = b.source AND a.bucket = b.bucket),
       |histogram_drift AS (
       |  SELECT j.source, CAST(COUNT(*) AS BIGINT) AS n_buckets, ta.tot_a, tb.tot_b,
       |         CAST(SUM(ABS(j.na * tb.tot_b - j.nb * ta.tot_a)) AS DOUBLE)
       |           / CAST(ta.tot_a * tb.tot_b AS DOUBLE) AS drift_l1
       |  FROM dr_j j
       |  JOIN dr_ta ta ON ta.source = j.source
       |  JOIN dr_tb tb ON tb.source = j.source
       |  GROUP BY j.source, ta.tot_a, tb.tot_b)""".stripMargin

  /** Incremental view maintenance: refresh a per-source aggregate
    * (doc count, total text chars) from snapshot A's aggregate plus the
    * ROW-LEVEL DELTA between snapshots — never rescanning the unchanged
    * bulk. The delta here is LENGTH-BASED: it keeps docs whose presence or
    * char-length changed, which is exactly sufficient for the maintained
    * (n_docs, sum_chars) view (an equal-length content edit cannot alter
    * either measure) but is NOT q156's content-level added/removed/changed
    * classification — an equal-length edit is invisible to this delta. To
    * maintain any fingerprint- or content-dependent view, diff on md5
    * fingerprints as [[diff]] does, not on length. Unchanged rows
    * contribute nothing and are filtered before the aggregate, which is
    * the entire point at 100 TB: the refresh costs O(|delta|), not
    * O(|corpus|). The DuckDB oracle computes the refreshed aggregate
    * DIRECTLY from snapshot B — equality of the two is the IVM
    * correctness proof, checked per source in exact integers.
    */
  def incrementalRefresh(a: DataFrame, b: DataFrame): DataFrame = {
    def manifest(df: DataFrame) = df.select(col("doc_id"), col("source"),
      length(col("text")).cast("long").as("chars"))
    val ma = manifest(a); val mb = manifest(b)
    val base = ma.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum("chars").as("sum_chars"))
    val delta = ma.withColumnRenamed("chars", "chars_a")
      .join(mb.withColumnRenamed("chars", "chars_b")
          .withColumnRenamed("source", "source_b"), Seq("doc_id"), "full")
      .filter(col("chars_a").isNull || col("chars_b").isNull
        || col("chars_a") =!= col("chars_b"))
      .select(coalesce(col("source"), col("source_b")).as("source"),
        (when(col("chars_b").isNotNull, 1L).otherwise(0L)
          - when(col("chars_a").isNotNull, 1L).otherwise(0L)).as("dn"),
        (coalesce(col("chars_b"), lit(0L)) - coalesce(col("chars_a"), lit(0L)))
          .as("dchars"))
      .groupBy("source")
      .agg(sum("dn").as("dn"), sum("dchars").as("dchars"))
    base.join(delta, Seq("source"), "full")
      .select(col("source"),
        (coalesce(col("n_docs"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n_docs"),
        (coalesce(col("sum_chars"), lit(0L)) + coalesce(col("dchars"), lit(0L)))
          .as("sum_chars"))
      .filter(col("n_docs") > 0)
  }

  /** DuckDB oracle for [[incrementalRefresh]] over [[snapshots]]: the
    * DIRECT aggregate of snapshot B (what the incremental path must
    * equal). Embed after `WITH` and select from `refresh_direct`.
    */
  val incrementalRefreshSql: String =
    s"""rf_b AS (
       |  SELECT doc_id, source,
       |         len(CASE WHEN ${coinSql("doc_id", "edit")} < 10
       |                  THEN text || ' [rev2]' ELSE text END) AS chars
       |  FROM documents
       |  WHERE ${coinSql("doc_id", "snapB")} < 95),
       |refresh_direct AS (
       |  SELECT source, COUNT(*) AS n_docs, CAST(SUM(chars) AS BIGINT) AS sum_chars
       |  FROM rf_b GROUP BY source)""".stripMargin

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
