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
}
