package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-mix curation operators: deterministic sampling over document
  * corpora. A training pipeline doesn't sample with RNG state — it needs
  * the SAME subset on every run, on any cluster layout, under retries.
  * Selection here is a pure function of the row's stable id: hash the id,
  * keep the row iff `hash mod 100 < pct`. No shuffle at all — the sample
  * is a filter, embarrassingly parallel over input splits, and composes
  * with pushdown (the filter sits directly on the scan).
  */
object Sampling {

  /** Stable per-row coin: first 48 bits of md5(doc_id) mod 100, identical
    * in DuckDB as `('0x' || substring(md5(...),1,12))::BIGINT % 100`.
    */
  private def coin(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 12), 16, 10).cast("long") % 100

  private def coinSql(id: String): String =
    s"('0x' || substring(md5(CAST($id AS VARCHAR)), 1, 12))::BIGINT % 100"

  /** Per-stratum sampling rates (percent, 0-100) with a default for
    * strata not listed — the "training mix": keep all of a curated
    * source, downsample the crawl.
    */
  def stratifiedSample(docs: DataFrame, rates: Seq[(String, Int)],
      defaultPct: Int = 10, stratum: String = "source"): DataFrame = {
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(col(stratum) === lit(s), lit(p)).otherwise(acc)
    }
    docs.filter(coin(col("doc_id")) < pct)
      .select(col("doc_id"), col(stratum), col("n_chars"))
  }

  /** DuckDB twin of [[stratifiedSample]] — same hash, same rates. */
  def stratifiedSampleSql(rates: Seq[(String, Int)], defaultPct: Int = 10,
      stratum: String = "source"): String = {
    def esc(s: String) = s.replace("'", "''")
    // strata conditions are mutually exclusive, so CASE order is free
    val pctExpr = rates
      .map { case (s, p) => s"WHEN $stratum = '${esc(s)}' THEN $p" }
      .mkString("CASE ", " ", s" ELSE $defaultPct END")
    s"""SELECT doc_id, $stratum, n_chars
       |FROM documents
       |WHERE ${coinSql("doc_id")} < ($pctExpr)""".stripMargin
  }
}
