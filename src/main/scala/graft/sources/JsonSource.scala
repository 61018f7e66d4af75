package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.OracleSafe

/** JSONL ingestion with malformed-row quarantine — the crawl-ingest
  * source format the reference's CSV/SQL loaders never cover: training
  * corpora overwhelmingly arrive as JSON lines with a real corruption
  * rate (truncated uploads, encoding damage, interleaved logs), and the
  * load must account for every line — silently dropping malformed rows
  * is how training sets lose mass unaudited.
  *
  * Scale/robustness design: the audit deliberately NEVER references
  * Spark's `_corrupt_record` column — filtering on it requires caching
  * the parsed relation (the documented from_json limitation), which a
  * 100 TB ingest cannot afford. Instead it runs TWO scans that each
  * stream: (1) a `DROPMALFORMED` parse with an explicit schema (no
  * sampling-based inference pass over the lake) aggregating the parseable
  * rows, and (2) a raw `text` line count; quarantined = lines − parsed.
  * Both are map-side-combinable single passes.
  *
  * Timestamps travel as epoch-micros longs inside the JSON so the round
  * trip is integer-exact — no timestamp-format parsing ambiguity; doubles
  * round-trip exactly through Jackson's shortest-repr printing.
  */
object JsonSource {

  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("us", LongType)))

  /** Stage the events table as JSONL, deterministically corrupting every
    * row whose `event_id % corruptMod == 0` (truncated + mangled so the
    * line can never parse). The corruption is part of the TEST HARNESS —
    * it manufactures the malformed-row population a real crawl arrives
    * with, keyed so the oracle can reproduce the expected split exactly.
    */
  def stageJsonl(events: DataFrame, outDir: String,
      corruptMod: Long = 97L): Unit = {
    require(corruptMod >= 1, s"corruptMod must be >= 1, got $corruptMod")
    // Contract check: the quarantine audit classifies a row as rejected if
    // any required field is null OR `value` is non-finite (to_json renders
    // NaN/Infinity as non-JSON tokens), while the oracle twin classifies
    // purely by `event_id % corruptMod` — a naturally-null/NaN input row
    // would silently diverge the two counts. Fail the STAGING loudly
    // instead, so the divergence can never masquerade as an engine bug.
    val offending = events.filter(
        col("event_id").isNull || col("event_type").isNull ||
        col("value").isNull || col("ts").isNull ||
        isnan(col("value")) || col("value") === Double.PositiveInfinity ||
        col("value") === Double.NegativeInfinity)
      .limit(1).count()
    require(offending == 0L,
      "stageJsonl input must have non-null fields and finite values — " +
        "the quarantine oracle classifies rows by corruption key alone")
    events.select(
        to_json(struct(col("event_id"), col("event_type"), col("value"),
          unix_micros(col("ts")).as("us"))).as("line"),
        col("event_id"))
      .select(when(col("event_id") % corruptMod === 0L,
          concat(lit("{\"event_id\":!corrupt "), substring(col("line"), 1, 9)))
        .otherwise(col("line")).as("value"))
      .write.mode("overwrite").text(outDir)
  }

  /** Ingest audit over a staged JSONL directory: per event type the
    * parsed row count and cent-exact value total, plus one
    * `zz_quarantined` row carrying the rejected-line count (NULL total —
    * there is no value to sum in a rejected line). A line is rejected if
    * it fails to parse (DROPMALFORMED) OR parses with any required field
    * null — Spark's JSON reader nulls a type-damaged field (a string
    * where a long belongs) instead of dropping the record, which would
    * otherwise slip silently into the "good" mass.
    */
  def ingestWithQuarantine(spark: SparkSession, path: String): DataFrame = {
    val required = eventSchema.fieldNames
    val valid = spark.read.schema(eventSchema)
      .option("mode", "DROPMALFORMED")
      .json(path)
      .filter(required.map(col(_).isNotNull).reduce(_ && _))
    val good = valid
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(OracleSafe.quant(col("value"), 100)).as("total_cents"))
    val totals = spark.read.text(path).agg(count(lit(1)).as("n_lines"))
      .crossJoin(broadcast(valid.agg(count(lit(1)).as("n_valid"))))
    val quarantined = totals.select(
      lit("zz_quarantined").as("event_type"),
      (col("n_lines") - col("n_valid")).as("n"),
      lit(null).cast("long").as("total_cents"))
    good.unionByName(quarantined).orderBy("event_type")
  }

  /** DuckDB twin of [[stageJsonl]] + [[ingestWithQuarantine]] — computed
    * from the PARQUET events table with the same corruption key, so a
    * hash match proves the JSON round trip lost exactly the corrupted
    * lines and nothing else (ids, types, and cent values all survive the
    * serialize → mangle → parse → aggregate path). Embed after `WITH `
    * and select from `json_ingest`.
    */
  def ingestWithQuarantineSql(corruptMod: Long = 97L): String =
    s"""ji_good AS (
       |  SELECT event_type, COUNT(*) AS n,
       |         CAST(SUM(${OracleSafe.quantSql("value", 100)}) AS BIGINT)
       |           AS total_cents
       |  FROM events WHERE event_id % $corruptMod <> 0
       |  GROUP BY event_type),
       |ji_bad AS (
       |  SELECT 'zz_quarantined' AS event_type, COUNT(*) AS n,
       |         CAST(NULL AS BIGINT) AS total_cents
       |  FROM events WHERE event_id % $corruptMod = 0),
       |json_ingest AS (
       |  SELECT * FROM ji_good UNION ALL SELECT * FROM ji_bad)""".stripMargin
}
