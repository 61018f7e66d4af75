package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.OracleSafe

/** Sequence packing — the LLM-training prep step that concatenates short
  * documents into fixed-token-budget training sequences (what sample
  * packing / "document packing" does before tokenizer+dataloader): doc d
  * goes to sequence floor(prev_cum / budget) where prev_cum is the token
  * count of everything packed before it — the deterministic streaming-
  * greedy rule (a doc that straddles a boundary belongs to the sequence
  * where it started).
  *
  * Scale: the running sum is a window ordered by doc_id — per SOURCE alone
  * that is one window partition per source, and a 100 TB crawl has few
  * sources with huge partitions: the single-partition window killer in
  * disguise. So the partition key is (source, shard) with
  * shard = doc_id div shardSize — bounded partitions by construction,
  * full parallelism, and the packing remains deterministic because shard
  * boundaries are pure arithmetic on the doc id (each shard packs
  * independently; a shard boundary also starts a fresh sequence, the same
  * compromise distributed tokenizer pipelines make to stay shardable).
  */
object Packing {

  def packSequences(docs: DataFrame, budget: Int = 256, shardSize: Int = 100): DataFrame = {
    val t = docs.select(col("source"),
      OracleSafe.intDiv(col("doc_id"), lit(shardSize)).as("shard"),
      col("doc_id"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val w = Window.partitionBy("source", "shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    t.withColumn("prev_cum", coalesce(sum("n_tokens").over(w), lit(0L)))
      .withColumn("seq_id", OracleSafe.intDiv(col("prev_cum"), lit(budget)))
      .groupBy("source", "shard", "seq_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("seq_tokens"))
  }

  /** Sliding-window document chunking — the complement of [[packSequences]]:
    * packing concatenates SHORT docs up to the context budget; chunking
    * splits LONG docs into overlapping `window`-token pieces on a `stride`
    * (overlap = window − stride keeps boundary context in both chunks, the
    * standard long-document prep for fixed-context training). Emits
    * (doc_id, chunk_idx, start_tok, chunk_tokens, chunk_fp) — the
    * fingerprint (48-bit md5 of the chunk text, the cross-engine hash
    * convention) stands in for shipping chunk text through the compare.
    *
    * Scale shape: pure per-row explode — ceil(n/stride) chunks per doc,
    * linear in corpus tokens, no shuffle at all (narrow-only plan; the
    * chunker runs at scan speed and parallelizes with input splits).
    */
  def chunkDocs(docs: DataFrame, window: Int = 64, stride: Int = 48): DataFrame = {
    require(window >= 1 && stride >= 1 && stride <= window,
      s"need 1 <= stride <= window, got window=$window stride=$stride")
    docs.select(col("doc_id"), split(col("text"), " ").as("ts"))
      .withColumn("n_toks", size(col("ts")).cast("long"))
      .select(col("doc_id"), col("ts"),
        explode(expr(s"sequence(0L, (n_toks + ${stride - 1}) DIV $stride - 1)"))
          .as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        (col("chunk_idx") * stride).as("start_tok"),
        expr(s"slice(ts, CAST(chunk_idx * $stride + 1 AS INT), $window)").as("ct"))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        size(col("ct")).as("chunk_tokens"),
        conv(substring(md5(array_join(col("ct"), " ")), 1, 12), 16, 10)
          .cast("long").as("chunk_fp"))
  }

  /** DuckDB twin of [[chunkDocs]]; embed after `WITH ` and select from
    * `chunks`.
    */
  def chunkDocsSql(window: Int = 64, stride: Int = 48): String =
    s"""chunk_t AS (
       |  SELECT doc_id, string_split(text, ' ') AS ts,
       |         len(string_split(text, ' ')) AS n_toks
       |  FROM documents),
       |chunks AS (
       |  SELECT doc_id, i - 1 AS chunk_idx, (i - 1) * $stride AS start_tok,
       |         CAST(len(ct) AS INT) AS chunk_tokens,
       |         ('0x' || substring(md5(array_to_string(ct, ' ')), 1, 12))::BIGINT AS chunk_fp
       |  FROM (SELECT doc_id, i,
       |               ts[(i - 1) * $stride + 1 : (i - 1) * $stride + $window] AS ct
       |        FROM (SELECT doc_id, ts,
       |                     unnest(generate_series(1, (n_toks + ${stride - 1}) // $stride)) AS i
       |              FROM chunk_t) g) s)""".stripMargin

  /** DuckDB twin of [[packSequences]] — identical window + arithmetic. */
  def packSequencesSql(budget: Int = 256, shardSize: Int = 100): String =
    s"""pt AS (
       |  SELECT source, doc_id // $shardSize AS shard, doc_id,
       |         len(string_split(text, ' ')) AS n_tokens
       |  FROM documents),
       |pc AS (
       |  SELECT source, shard, n_tokens,
       |         COALESCE(SUM(n_tokens) OVER (PARTITION BY source, shard ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev_cum
       |  FROM pt),
       |packs AS (
       |  SELECT source, shard, CAST(prev_cum // $budget AS BIGINT) AS seq_id,
       |         COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens
       |  FROM pc GROUP BY 1, 2, 3)""".stripMargin

  /** Context-length planning: for each candidate sequence length, the
    * padding cost of document-boundary chunking (every doc split into
    * ceil(n/L) sequences, the last one padded to L). This is the sizing
    * decision made BEFORE [[packSequences]]: a grid small enough to
    * broadcast (|grid| rows) crossed against a 1-column token-count
    * projection, all-integer sums, ONE double division per grid row.
    * Pure scan + broadcast + aggregate — no shuffle grows with the corpus.
    */
  def contextLengthPlan(docs: DataFrame,
      grid: Seq[Int] = Seq(32, 64, 128, 256)): DataFrame = {
    require(grid.nonEmpty && grid.forall(_ >= 1), s"bad grid: $grid")
    val spark = docs.sparkSession
    import spark.implicits._
    val toks = docs.select(
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    val g = grid.toDF("seq_len")
    toks.crossJoin(broadcast(g))
      .groupBy("seq_len")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("total_tokens"),
        sum(OracleSafe.intDiv(col("n_tokens") + col("seq_len") - 1, col("seq_len")))
          .as("n_seqs"),
        sum((col("seq_len") - col("n_tokens") % col("seq_len")) % col("seq_len"))
          .as("pad_tokens"))
      .select(col("seq_len"), col("n_docs"), col("total_tokens"), col("n_seqs"),
        col("pad_tokens"),
        (col("pad_tokens").cast("double")
          / (col("n_seqs") * col("seq_len").cast("long")).cast("double"))
          .as("pad_frac"))
      .orderBy("seq_len")
  }

  /** DuckDB twin of [[contextLengthPlan]]; embed after `WITH ` and select
    * from `context_length_plan`.
    */
  def contextLengthPlanSql(grid: Seq[Int] = Seq(32, 64, 128, 256)): String = {
    val values = grid.map(l => s"($l)").mkString(", ")
    val dv = OracleSafe.intDivSql("n_tokens + seq_len - 1", "seq_len")
    s"""clp_toks AS (
       |  SELECT CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |clp_grid AS (SELECT seq_len FROM (VALUES $values) AS g(seq_len)),
       |clp AS (
       |  SELECT seq_len, COUNT(*) AS n_docs,
       |         CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       |         CAST(SUM($dv) AS BIGINT) AS n_seqs,
       |         CAST(SUM((seq_len - n_tokens % seq_len) % seq_len) AS BIGINT)
       |           AS pad_tokens
       |  FROM clp_toks CROSS JOIN clp_grid GROUP BY 1),
       |context_length_plan AS (
       |  SELECT seq_len, n_docs, total_tokens, n_seqs, pad_tokens,
       |         CAST(pad_tokens AS DOUBLE)
       |           / CAST(n_seqs * CAST(seq_len AS BIGINT) AS DOUBLE) AS pad_frac
       |  FROM clp)""".stripMargin
  }
}
