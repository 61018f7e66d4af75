package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.OracleSafe

/** Data profiling — the "what is in this table" pass every warehouse load
  * (and every training-data ingest) runs before trusting a source: value
  * histograms and per-column null/distinct/range statistics.
  */
object Profile {

  /** Equi-width histogram over an INTEGER-valued column (callers put money
    * on the cents grid first — exact arithmetic is what lets the oracle
    * match bucket-for-bucket). Bounds come from a 1-row min/max aggregate
    * broadcast into the scan (the in-plan params pattern — no driver
    * action, no second submission of the input lineage... the input IS
    * scanned twice, once for bounds and once for bucketing, which is the
    * honest cost of exact bounds; at 100 TB you'd feed approximate bounds
    * and a final clamp, same shape).
    *
    * bucket(v) = min(k-1, (v - lo) · k div (hi - lo + 1)) — all-integer,
    * the +1 keeps the max value inside bucket k-1 without a special case
    * and makes the degenerate hi = lo input well-defined (all rows in
    * bucket 0). Output: (bucket, n, lo_v, hi_v) with lo_v/hi_v the OCCUPIED
    * range per bucket, so empty buckets are absent by construction.
    */
  def histogram(df: DataFrame, value: Column, k: Int = 20): DataFrame = {
    val v = value.cast("long")
    val bounds = df.agg(min(v).as("min_v"), max(v).as("max_v"))
    df.select(v.as("v")).crossJoin(broadcast(bounds))
      .select(least(lit(k - 1),
        OracleSafe.intDiv((col("v") - col("min_v")) * k,
          col("max_v") - col("min_v") + 1)).cast("int").as("bucket"), col("v"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), min("v").as("lo_v"), max("v").as("hi_v"))
  }

  /** DuckDB twin of [[histogram]] for a value expression over `table`. */
  def histogramSql(table: String, valueExpr: String, k: Int = 20): String =
    s"""hv AS (SELECT CAST(($valueExpr) AS BIGINT) AS v FROM $table),
       |hb AS (SELECT MIN(v) AS min_v, MAX(v) AS max_v FROM hv),
       |hist AS (
       |  SELECT LEAST($k - 1, ((v - min_v) * $k) // (max_v - min_v + 1)) AS bucket,
       |         COUNT(*) AS n, MIN(v) AS lo_v, MAX(v) AS hi_v
       |  FROM hv, hb
       |  GROUP BY 1)""".stripMargin

  /** A profiled column: its name plus how to render its typed min/max as a
    * string BOTH engines print identically (timestamps and decimals do not
    * round-trip through a bare CAST-to-string the same way everywhere).
    */
  final case class ColSpec(name: String, fmt: Column => Column, sqlFmt: String => String)

  object ColSpec {
    /** Integers and strings: a plain cast agrees across engines. */
    def plain(name: String): ColSpec =
      ColSpec(name, _.cast("string"), e => s"CAST($e AS VARCHAR)")

    /** Doubles carrying money: pin to the 0.01 grid, render as DECIMAL. */
    def money(name: String): ColSpec = ColSpec(name,
      c => OracleSafe.money(c).cast("string"),
      e => s"CAST(${OracleSafe.moneySql(e)} AS VARCHAR)")

    /** Timestamps: explicit second-resolution format on both engines. */
    def ts(name: String): ColSpec = ColSpec(name,
      c => date_format(c, "yyyy-MM-dd HH:mm:ss"),
      e => s"strftime($e, '%Y-%m-%d %H:%M:%S')")
  }

  /** One-PASS column profiler: for every column, null count, exact distinct
    * count, and formatted min/max — a single wide aggregate over one scan,
    * then an explode of the per-column stat structs (rows = columns, the
    * classic profile unpivot). Multiple exact COUNT(DISTINCT)s plan as one
    * Expand (rows × columns) feeding one aggregate — still one scan; at
    * 100 TB swap in approx_count_distinct and the Expand disappears, same
    * contract minus exactness (kept exact here so the oracle can pin it).
    */
  def columns(df: DataFrame, specs: Seq[ColSpec]): DataFrame = {
    val aggs = specs.flatMap { s =>
      Seq(count(col(s.name)).as(s"${s.name}__n"),
        countDistinct(col(s.name)).as(s"${s.name}__d"),
        min(col(s.name)).as(s"${s.name}__lo"),
        max(col(s.name)).as(s"${s.name}__hi"))
    }
    val wide = df.agg(count(lit(1)).as("__rows"), aggs: _*)
    val stats = specs.map { s =>
      struct(lit(s.name).as("col_name"),
        (col("__rows") - col(s"${s.name}__n")).as("n_nulls"),
        col(s"${s.name}__d").as("n_distinct"),
        s.fmt(col(s"${s.name}__lo")).as("min_s"),
        s.fmt(col(s"${s.name}__hi")).as("max_s"))
    }
    wide.select(explode(array(stats: _*)).as("p")).select("p.*")
  }

  /** DuckDB twin of [[columns]]: one SELECT per column, UNION ALL — the
    * single-node engine does not need the unpivot trick.
    */
  def columnsSql(table: String, specs: Seq[ColSpec]): String =
    specs.map { s =>
      s"""SELECT '${s.name}' AS col_name,
         |       COUNT(*) - COUNT(${s.name}) AS n_nulls,
         |       COUNT(DISTINCT ${s.name}) AS n_distinct,
         |       ${s.sqlFmt(s"MIN(${s.name})")} AS min_s,
         |       ${s.sqlFmt(s"MAX(${s.name})")} AS max_s
         |FROM $table""".stripMargin
    }.mkString("\nUNION ALL\n")

  /** Robust spread per event type: exact median and exact MAD (median
    * absolute deviation) — the outlier-resistant location/scale pair that
    * replaces mean/stddev when a feed contains fat-tailed junk (one 10⁹
    * mis-keyed amount shifts a mean arbitrarily; it moves a median not at
    * all and a MAD by at most one rank).
    *
    * Exactness: both medians use the q85 lower/upper-middle convention
    * (row_number over a (value, event_id) total order; midpoint of the two
    * middle elements) — rank selection plus ONE double average, no float
    * accumulation. The deviation |value − median| is a single IEEE
    * subtraction of the same two doubles on both engines.
    *
    * Scale shape: two per-type sort windows (partition-parallel; event
    * types are few but each partition sorts independently — the honest
    * cost of EXACT medians; at 100 TB you'd swap in q90's
    * percentile_approx contract) and one co-partitioned join back.
    */
  def robustSpread(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byType = Window.partitionBy("event_type")
    def middleOf(df: DataFrame, order: Column, out: String): DataFrame =
      df.withColumn("rn", row_number().over(byType.orderBy(order, col("event_id"))))
        .withColumn("n", count(lit(1)).over(byType))
        .filter((col("rn") * 2 - col("n")).isin(0, 1, 2))
        .groupBy("event_type")
        .agg(((min(order) + max(order)) / 2).as(out))
    val med = middleOf(
      events.select(col("event_type"), col("value"), col("event_id")),
      col("value"), "median")
    val dev = events.join(med, Seq("event_type"))
      .select(col("event_type"), col("event_id"), col("median"),
        abs(col("value") - col("median")).as("dev"))
    middleOf(dev, col("dev"), "mad")
      .join(med, Seq("event_type"))
      .select("event_type", "median", "mad")
  }

  /** Exact multi-quantile suite per event type — percentile_disc
    * semantics, position ceil(p·n/100) in all-integer arithmetic, picking
    * ACTUAL data elements (no interpolation → no float arithmetic to
    * disagree on; the convention both engines compute bit-identically).
    * One sort window per type serves every requested percentile: the
    * positions are computed from the same (rn, n) pair and folded out as
    * conditional aggregates — adding a percentile costs zero extra passes.
    *
    * Scale: same per-type sort-window profile as [[robustSpread]]; the
    * approx path for 100 TB is q90's percentile_approx error contract.
    */
  def quantileSuite(events: DataFrame,
      percents: Seq[Int] = Seq(25, 50, 75, 90, 99)): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100)
        && percents.distinct.size == percents.size,
      s"percents must be distinct in [1,100]: $percents")
    import org.apache.spark.sql.expressions.Window
    val byType = Window.partitionBy("event_type")
    val ranked = events.select(col("event_type"), col("value"), col("event_id"))
      .withColumn("rn", row_number().over(byType.orderBy(col("value"), col("event_id"))))
      .withColumn("n", count(lit(1)).over(byType))
    val picks = percents.map { p =>
      max(when(col("rn") ===
          OracleSafe.intDiv(col("n") * p + lit(99), lit(100)), col("value")))
        .as(s"p$p")
    }
    ranked.groupBy("event_type").agg(picks.head, picks.tail: _*)
  }

  /** DuckDB twin of [[quantileSuite]]. */
  def quantileSuiteSql(percents: Seq[Int] = Seq(25, 50, 75, 90, 99)): String = {
    val cols = percents.map { p =>
      s"MAX(CASE WHEN rn = (n * $p + 99) // 100 THEN value END) AS p$p"
    }.mkString(",\n       |       ")
    s"""quantile_suite AS (
       |  SELECT event_type,
       |       $cols
       |  FROM (SELECT event_type, value,
       |               ROW_NUMBER() OVER (PARTITION BY event_type
       |                                  ORDER BY value, event_id) AS rn,
       |               COUNT(*) OVER (PARTITION BY event_type) AS n
       |        FROM events) t
       |  GROUP BY event_type)""".stripMargin
  }

  /** DuckDB twin of [[robustSpread]]. */
  val robustSpreadSql: String =
    """med AS (
      |  SELECT event_type, (MIN(value) + MAX(value)) / 2 AS median
      |  FROM (SELECT event_type, value,
      |               ROW_NUMBER() OVER (PARTITION BY event_type
      |                                  ORDER BY value, event_id) AS rn,
      |               COUNT(*) OVER (PARTITION BY event_type) AS n
      |        FROM events) t
      |  WHERE rn * 2 - n IN (0, 1, 2) GROUP BY event_type),
      |devs AS (
      |  SELECT e.event_type, ABS(e.value - m.median) AS dev, e.event_id
      |  FROM events e JOIN med m USING (event_type)),
      |mads AS (
      |  SELECT event_type, (MIN(dev) + MAX(dev)) / 2 AS mad
      |  FROM (SELECT event_type, dev,
      |               ROW_NUMBER() OVER (PARTITION BY event_type
      |                                  ORDER BY dev, event_id) AS rn,
      |               COUNT(*) OVER (PARTITION BY event_type) AS n
      |        FROM devs) t
      |  WHERE rn * 2 - n IN (0, 1, 2) GROUP BY event_type),
      |robust_spread AS (
      |  SELECT event_type, median, mad FROM mads JOIN med USING (event_type))""".stripMargin
}
