package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.OracleSafe

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
    requireDistinctStrata(rates)
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(col(stratum) === lit(s), lit(p)).otherwise(acc)
    }
    docs.filter(coin(col("doc_id")) < pct)
      .select(col("doc_id"), col(stratum), col("n_chars"))
  }

  /** Leakage-safe train/test split: the hash coin is flipped on the
    * near-dup CLUSTER id, not the document id, so a document and its
    * near-duplicates always land in the same split — assigning per-doc
    * would leak training text into the test set through paraphrases, the
    * classic eval-contamination bug. Documents outside any candidate pair
    * are their own singleton cluster (coin on their own id).
    */
  def leakageSafeSplit(docs: DataFrame, trainPct: Int = 90): DataFrame = {
    val clusters = Dedup.dedupClusters(docs).select("doc_id", "cluster_id")
    docs.select("doc_id").join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
      .withColumn("split",
        when(coin(col("cluster_id")) < trainPct, lit("train")).otherwise(lit("test")))
  }

  /** DuckDB twin of [[leakageSafeSplit]] — recursive-CTE clusters plus the
    * same coin. Must be opened with `WITH RECURSIVE`.
    */
  def leakageSafeSplitSql(trainPct: Int = 90): String =
    s"""${Dedup.dedupClustersSql()},
       |split AS (
       |  SELECT d.doc_id,
       |         COALESCE(c.cluster_id, d.doc_id) AS cluster_id,
       |         CASE WHEN ${coinSql("COALESCE(c.cluster_id, d.doc_id)")} < $trainPct
       |              THEN 'train' ELSE 'test' END AS split
       |  FROM documents d LEFT JOIN dedup_clusters c ON d.doc_id = c.doc_id)""".stripMargin

  /** The engine's foldLeft makes the LAST duplicate rate win while the SQL
    * twin's CASE makes the FIRST win — the two only agree because strata
    * are distinct, so enforce that instead of assuming it.
    */
  private def requireDistinctStrata(rates: Seq[(String, Int)]): Unit = {
    val dups = rates.map(_._1).groupBy(identity).collect {
      case (k, vs) if vs.size > 1 => k
    }
    require(dups.isEmpty,
      s"duplicate stratum keys in rates: ${dups.mkString(", ")}")
  }

  /** DuckDB twin of [[stratifiedSample]] — same hash, same rates. */
  def stratifiedSampleSql(rates: Seq[(String, Int)], defaultPct: Int = 10,
      stratum: String = "source"): String = {
    requireDistinctStrata(rates)
    def esc(s: String) = s.replace("'", "''")
    // strata conditions are mutually exclusive (enforced above), so CASE
    // order is free
    val pctExpr = rates
      .map { case (s, p) => s"WHEN $stratum = '${esc(s)}' THEN $p" }
      .mkString("CASE ", " ", s" ELSE $defaultPct END")
    s"""SELECT doc_id, $stratum, n_chars
       |FROM documents
       |WHERE ${coinSql("doc_id")} < ($pctExpr)""".stripMargin
  }

  /** Training-mix arithmetic, in-plan: given target mixture WEIGHTS per
    * source (relative shares, integers), compute the per-source sampling
    * RATE that realizes the largest mix the corpus can supply. The
    * binding constraint is the scarcest source relative to its share:
    * with avail_s tokens on hand, the feasible mix size maximizes at
    * min_s(avail_s / w_s) mix-units, so rate_s = min_ratio · w_s /
    * avail_s — the argmin source samples at exactly 1.0 and everything
    * else downsamples proportionally. Runs as one aggregate over the
    * corpus plus a broadcast 1-row min — the mixture solver never touches
    * the driver, so recomputing it per ingestion batch is free.
    */
  def mixtureRates(docs: DataFrame, weights: Seq[(String, Int)],
      defaultW: Int = 1): DataFrame = {
    requireDistinctStrata(weights)
    val w = weights.foldLeft(lit(defaultW)) { case (acc, (s, p)) =>
      when(col("source") === lit(s), lit(p)).otherwise(acc)
    }
    val avail = docs
      .select(col("source"), size(split(col("text"), " ")).cast("long").as("t"))
      .groupBy("source").agg(sum("t").as("avail"))
      .withColumn("w", w)
    val minR = avail.agg(min(col("avail").cast("double") / col("w")).as("min_ratio"))
    avail.crossJoin(broadcast(minR))
      .select(col("source"), col("avail"), col("w"),
        ((col("min_ratio") * col("w")) / col("avail").cast("double")).as("rate"))
  }

  /** DuckDB twin of [[mixtureRates]] — same integer weights, same
    * expression shapes (division results are correctly rounded doubles of
    * exact integer inputs, so the two engines agree bit-for-bit).
    */
  def mixtureRatesSql(weights: Seq[(String, Int)], defaultW: Int = 1): String = {
    requireDistinctStrata(weights)
    def esc(s: String) = s.replace("'", "''")
    val wExpr = weights
      .map { case (s, p) => s"WHEN source = '${esc(s)}' THEN $p" }
      .mkString("CASE ", " ", s" ELSE $defaultW END")
    s"""WITH avail AS (
       |  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS avail
       |  FROM documents GROUP BY source),
       |aw AS (SELECT source, avail, CAST($wExpr AS INT) AS w FROM avail),
       |mr AS (SELECT MIN(CAST(avail AS DOUBLE) / w) AS min_ratio FROM aw)
       |SELECT source, avail, w, (min_ratio * w) / CAST(avail AS DOUBLE) AS rate
       |FROM aw, mr""".stripMargin
  }

  /** Deterministic weighted sampling without replacement, k per stratum —
    * the integer A-Res scheme (Efraimidis & Spirakis 2006, priority
    * u^(1/w), taken in rank-equivalent integer form u/w: a row with twice
    * the weight halves its priority and doubles its selection odds). The
    * "random" u is the stable 48-bit md5 coin, so the sample is a pure
    * function of row identity — identical across runs, retries, and
    * cluster layouts, which is what a reproducible training-mix needs.
    *
    * Selection runs on the bounded-heap [[graft.plans.TopK]] operator —
    * one shuffle on the stratum, no global sort, no per-group
    * row_number window. Weight = o_totalprice quantized to an exact
    * integer cent grid (clamped ≥ 1 so zero/negative weights can't
    * divide by zero or invert the ordering).
    */
  def weightedSample(orders: DataFrame, k: Int = 5): DataFrame = {
    val u = conv(substring(md5(col("o_orderkey").cast("string")), 1, 12), 16, 10)
      .cast("long")
    val w = greatest(lit(1L), OracleSafe.quant(col("o_totalprice"), 100))
    val prioritized = orders.select(
      col("o_orderpriority").as("stratum"), col("o_orderkey"),
      OracleSafe.intDiv(u, w).as("priority"))
    graft.plans.TopK.perKey(prioritized, Seq("stratum"),
        Seq(graft.plans.TopK.asc("priority"), graft.plans.TopK.asc("o_orderkey")),
        k, rankName = "rnk")
      .select("stratum", "o_orderkey", "priority")
  }

  /** DuckDB twin of [[weightedSample]] — same coin, same integer
    * priority, ROW_NUMBER in place of the bounded heap.
    */
  def weightedSampleSql(k: Int = 5): String = {
    val u = s"('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 12))::BIGINT"
    val w = s"GREATEST(1, ${OracleSafe.quantSql("o_totalprice", 100)})"
    s"""SELECT stratum, o_orderkey, priority
       |FROM (
       |  SELECT o_orderpriority AS stratum, o_orderkey,
       |         ${OracleSafe.intDivSql(u, w)} AS priority,
       |         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
       |           ORDER BY ${OracleSafe.intDivSql(u, w)}, o_orderkey) AS rnk
       |  FROM orders)
       |WHERE rnk <= $k""".stripMargin
  }
}
