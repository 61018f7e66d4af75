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

  /** q260 — exact two-sample Kolmogorov–Smirnov drift per event type:
    * the feed splits into an early and a late half at the midpoint
    * calendar day, and D = sup over x of |ECDF_early(x) − ECDF_late(x)|
    * is computed EXACTLY — no binning, unlike the q161 bucketed L1 drift,
    * so a pure shape change that never moves bucket totals still
    * registers. The sup is taken over per-(type, value) count rows:
    * cumulative counts ca/cb ordered by value give the numerator
    * max|ca·nb − cb·na| in ALL-INTEGER arithmetic; the only doubles are
    * the final D = num/(na·nb) and the asymptotic α=0.05 gate
    * D > 1.358·√((na+nb)/(na·nb)) (Smirnov's critical value) — √ is
    * IEEE-correctly-rounded, so both engines agree bit-for-bit.
    *
    * Scale shape: one map-side-combinable count per (type, value), then
    * a per-type sort window over the DISTINCT-VALUE grain (bounded by
    * value cardinality, not row count). The cross-product ca·nb caps the
    * exact form at ~3·10⁹ rows per side (BIGINT); past that you run the
    * same statistic on the q206 hash-sample per side — the estimator's
    * √n error shrinks exactly as the KS bands do.
    */
  def ksDrift(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val day = OracleSafe.intDiv(expr("ts_ns DIV 1000000"), lit(86400000L))
    val vals = events.select(col("event_type"), col("value"), day.as("day"))
    val bounds = vals.agg(min("day").as("lo"), max("day").as("hi"))
    val tagged = vals.crossJoin(broadcast(bounds))
      .withColumn("early",
        (col("day") <= expr("(lo + hi) DIV 2")).cast("long"))
    val counted = tagged.groupBy("event_type", "value")
      .agg(sum(col("early")).as("va"), sum(lit(1L) - col("early")).as("vb"))
    val w = Window.partitionBy("event_type").orderBy("value")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = counted
      .withColumn("ca", sum("va").over(w))
      .withColumn("cb", sum("vb").over(w))
    val totals = counted.groupBy("event_type")
      .agg(sum("va").as("na"), sum("vb").as("nb"))
    cum.join(broadcast(totals), Seq("event_type"))
      .groupBy("event_type", "na", "nb")
      .agg(max(abs(col("ca") * col("nb") - col("cb") * col("na"))).as("d_num"))
      .select(col("event_type"), col("na"), col("nb"), col("d_num"),
        (col("d_num").cast("double") / (col("na") * col("nb")).cast("double"))
          .as("d_stat"))
      .withColumn("drifted",
        (col("d_stat") > lit(1.358) * sqrt((col("na") + col("nb")).cast("double")
          / (col("na") * col("nb")).cast("double"))).cast("int"))
      .orderBy("event_type")
  }

  /** DuckDB twin of [[ksDrift]]; embed after `WITH ` and select from
    * `ks_drift`.
    */
  def ksDriftSql(): String = {
    val day = OracleSafe.intDivSql("epoch_ms(ts)", "86400000")
    s"""ks_vals AS (
       |  SELECT event_type, value, $day AS day FROM events),
       |ks_bounds AS (
       |  SELECT MIN(day) AS lo, MAX(day) AS hi FROM ks_vals),
       |ks_counted AS (
       |  SELECT event_type, value,
       |         CAST(SUM(CASE WHEN day <= ((lo + hi) // 2) THEN 1 ELSE 0 END)
       |           AS BIGINT) AS va,
       |         CAST(SUM(CASE WHEN day <= ((lo + hi) // 2) THEN 0 ELSE 1 END)
       |           AS BIGINT) AS vb
       |  FROM ks_vals, ks_bounds GROUP BY event_type, value),
       |ks_cum AS (
       |  SELECT event_type, va, vb,
       |         SUM(va) OVER w AS ca, SUM(vb) OVER w AS cb
       |  FROM ks_counted
       |  WINDOW w AS (PARTITION BY event_type ORDER BY value
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
       |ks_tot AS (
       |  SELECT event_type, CAST(SUM(va) AS BIGINT) AS na,
       |         CAST(SUM(vb) AS BIGINT) AS nb
       |  FROM ks_counted GROUP BY event_type),
       |ks_drift AS (
       |  SELECT c.event_type, t.na, t.nb,
       |         CAST(MAX(ABS(c.ca * t.nb - c.cb * t.na)) AS BIGINT) AS d_num,
       |         CAST(MAX(ABS(c.ca * t.nb - c.cb * t.na)) AS DOUBLE)
       |           / CAST(t.na * t.nb AS DOUBLE) AS d_stat,
       |         CASE WHEN CAST(MAX(ABS(c.ca * t.nb - c.cb * t.na)) AS DOUBLE)
       |                     / CAST(t.na * t.nb AS DOUBLE)
       |                   > 1.358 * sqrt(CAST(t.na + t.nb AS DOUBLE)
       |                                  / CAST(t.na * t.nb AS DOUBLE))
       |              THEN 1 ELSE 0 END AS drifted
       |  FROM ks_cum c JOIN ks_tot t USING (event_type)
       |  GROUP BY c.event_type, t.na, t.nb)""".stripMargin
  }

  /** q286 — WILSON LOWER-BOUND ranking: parts ranked by the 95% Wilson
    * score lower bound of their return rate instead of the raw rate —
    * the small-sample correction behind every "sort by rating" system
    * (a 2/2 part must NOT outrank a 28/30 part; the raw rate says it
    * does, the lower bound says it doesn't — spec-pinned). Counts are
    * exact integers from one map-side-combinable aggregate; the bound
    * itself is IEEE double arithmetic written in the IDENTICAL operation
    * order in both engines (sqrt is correctly-rounded by IEEE 754, so
    * the full expression is engine-exact — no frozen table needed,
    * unlike ln/exp in q228/q274). z = 1.96 rides as a literal.
    *
    * Output: top-k by (wilson_lb desc, partkey), with the raw rate
    * beside the bound so the re-ranking is visible in the data.
    */
  def wilsonReturnRanking(lineitem: DataFrame, k: Int = 20): DataFrame = {
    val counts = lineitem.groupBy("l_partkey")
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r"))
    val nD = col("n").cast("double")
    val p = col("r").cast("double") / nD
    val z = lit(1.96)
    val z2 = z * z
    val lb = (p + z2 / (lit(2.0) * nD)
      - z * sqrt((p * (lit(1.0) - p) + z2 / (lit(4.0) * nD)) / nD)) /
      (lit(1.0) + z2 / nD)
    counts.select(col("l_partkey"), col("n"), col("r"), p.as("rate"),
        lb.as("wilson_lb"))
      .orderBy(col("wilson_lb").desc, col("l_partkey"))
      .limit(k)
  }

  /** q311 — SPEARMAN RANK CORRELATION with full tie correction, per
    * market segment, between a customer's account balance and their
    * total order spend — the monotone-association audit a feature
    * pipeline runs before trusting a signal (Pearson sees only LINEAR
    * association; a curation gate built on "balance predicts spend"
    * needs the rank version). q165's matryoshka audit uses the
    * 1 − 6Σd²/(n(n²−1)) shortcut, which is only valid with NO ties; this
    * operator handles ties correctly via Pearson-on-AVERAGE-RANKS — the
    * textbook tie-corrected definition — and the zero-spend customers
    * (no orders) form a real massive tie group that exercises it.
    *
    * Numerics: average ranks are half-integers, so DOUBLED ranks
    * (2·avg_rank = 2·|{v' < v}| + |{v' = v}| + 1) stay exact BIGINTs —
    * the ×4 this puts on covariance and variances cancels in ρ. All
    * sums ACCUMULATE in an explicit DECIMAL(38,0) (Spark) / HUGEINT
    * (DuckDB): exact and associative, immune to the Σr² ≈ n³ BIGINT
    * overflow past ~10⁶ rows per group. The decimal ceiling is real but
    * astronomical — Σ(2r)² ≤ 4n³ stays inside 38 digits up to n ≈ 10¹²
    * rows PER SEGMENT (and the nΣxy − ΣxΣy combination ≤ 4n⁴ up to
    * n ≈ 10⁹); past that, non-ANSI Spark yields NULL rho rather than a
    * wrong value (silent-NULL, not silent-garbage — enable ANSI mode to
    * make it an error). ρ = (nΣxy − ΣxΣy) / (√(nΣx²−(Σx)²)·√(nΣy²−(Σy)²))
    * is then one division over a product of two correctly-rounded sqrts
    * (the q301 MCC discipline). A zero-variance side reports NULL.
    *
    * Scale shape: ranks are NOT a row-level sort — counts aggregate to
    * the (segment, value) grain, ONE cumulative window runs over that
    * bounded distinct-value grain (the q260 KS shape), and rows join
    * their rank back by value. Three value-grain shuffles total; no
    * window ever sees raw rows.
    */
  def spearmanBySegment(customer: DataFrame, orders: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val spend = orders.groupBy(col("o_custkey").as("c_custkey"))
      .agg(sum(OracleSafe.quant(col("o_totalprice"), 100)).as("y"))
    val base = customer.select(col("c_custkey"),
        col("c_mktsegment").as("seg"),
        OracleSafe.quant(col("c_acctbal"), 100).as("x"))
      .join(spend, Seq("c_custkey"), "left")
      .na.fill(0L, Seq("y"))
    // doubled average rank at the (seg, value) grain: 2·cnt_less + cnt + 1
    def rank2(c: String): DataFrame = {
      val w = Window.partitionBy("seg").orderBy(c)
      base.groupBy(col("seg"), col(c)).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum("cnt").over(w))
        .select(col("seg"), col(c),
          (lit(2L) * (col("cum") - col("cnt")) + col("cnt") + lit(1L))
            .as(s"${c}_r2"))
    }
    // products multiply in (18,0) — precision 37, exact for any
    // realistic rank — then every sum accumulates in an EXPLICIT
    // (38,0), so the stated numeric contract is in the plan, not left
    // to Spark's implicit precision-widening rules
    val dec = DecimalType(18, 0)
    val dec38 = DecimalType(38, 0)
    val agg = base
      .join(rank2("x"), Seq("seg", "x"))
      .join(rank2("y"), Seq("seg", "y"))
      .groupBy("seg").agg(
        count(lit(1)).as("n"),
        sum(col("x_r2").cast(dec38)).as("sx"),
        sum(col("y_r2").cast(dec38)).as("sy"),
        sum((col("x_r2").cast(dec) * col("y_r2").cast(dec)).cast(dec38))
          .as("sxy"),
        sum((col("x_r2").cast(dec) * col("x_r2").cast(dec)).cast(dec38))
          .as("sxx"),
        sum((col("y_r2").cast(dec) * col("y_r2").cast(dec)).cast(dec38))
          .as("syy"))
    val nD = col("n").cast(dec)
    val num = (nD * col("sxy") - col("sx") * col("sy")).cast("double")
    val vx = (nD * col("sxx") - col("sx") * col("sx")).cast("double")
    val vy = (nD * col("syy") - col("sy") * col("sy")).cast("double")
    agg.select(col("seg").as("c_mktsegment"), col("n"),
        when(vx === 0.0 || vy === 0.0, lit(null).cast("double"))
          .otherwise(num / (sqrt(vx) * sqrt(vy))).as("rho"))
      .orderBy("c_mktsegment")
  }

  /** DuckDB twin of [[spearmanBySegment]] — identical doubled-rank
    * arithmetic in HUGEINT. Embed after `WITH ` and select from
    * `spearman`.
    */
  def spearmanBySegmentSql(): String =
    s"""sp_spend AS (
       |  SELECT o_custkey AS c_custkey,
       |         CAST(SUM(${OracleSafe.quantSql("o_totalprice", 100)})
       |           AS BIGINT) AS y
       |  FROM orders GROUP BY 1),
       |sp_base AS (
       |  SELECT c.c_custkey, c.c_mktsegment AS seg,
       |         ${OracleSafe.quantSql("c_acctbal", 100)} AS x,
       |         COALESCE(s.y, 0) AS y
       |  FROM customer c LEFT JOIN sp_spend s USING (c_custkey)),
       |sp_xr AS (
       |  SELECT seg, x, 2 * (cum - cnt) + cnt + 1 AS x_r2
       |  FROM (SELECT seg, x, COUNT(*) AS cnt,
       |               SUM(COUNT(*)) OVER (PARTITION BY seg ORDER BY x)
       |                 AS cum
       |        FROM sp_base GROUP BY seg, x) t),
       |sp_yr AS (
       |  SELECT seg, y, 2 * (cum - cnt) + cnt + 1 AS y_r2
       |  FROM (SELECT seg, y, COUNT(*) AS cnt,
       |               SUM(COUNT(*)) OVER (PARTITION BY seg ORDER BY y)
       |                 AS cum
       |        FROM sp_base GROUP BY seg, y) t),
       |sp_agg AS (
       |  SELECT b.seg, COUNT(*) AS n,
       |         SUM(CAST(xr.x_r2 AS HUGEINT)) AS sx,
       |         SUM(CAST(yr.y_r2 AS HUGEINT)) AS sy,
       |         SUM(CAST(xr.x_r2 AS HUGEINT) * CAST(yr.y_r2 AS HUGEINT))
       |           AS sxy,
       |         SUM(CAST(xr.x_r2 AS HUGEINT) * CAST(xr.x_r2 AS HUGEINT))
       |           AS sxx,
       |         SUM(CAST(yr.y_r2 AS HUGEINT) * CAST(yr.y_r2 AS HUGEINT))
       |           AS syy
       |  FROM sp_base b
       |  JOIN sp_xr xr ON b.seg = xr.seg AND b.x = xr.x
       |  JOIN sp_yr yr ON b.seg = yr.seg AND b.y = yr.y
       |  GROUP BY b.seg),
       |spearman AS (
       |  SELECT seg AS c_mktsegment, CAST(n AS BIGINT) AS n,
       |         CASE WHEN (n * sxx - sx * sx) = 0
       |                OR (n * syy - sy * sy) = 0 THEN NULL
       |              ELSE CAST(n * sxy - sx * sy AS DOUBLE)
       |                   / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
       |                      * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
       |           END AS rho
       |  FROM sp_agg)""".stripMargin

  /** q313 — CHI-SQUARED independence drift over the (event_type ×
    * day-of-week) contingency table: the categorical companion to
    * q260's KS (continuous values) and q161's bucketed L1 — "is the
    * type mix independent of the weekday, and if not, WHICH cells
    * drive it". Output is one row per cell carrying the observed
    * count, the expected count, the cell's χ² contribution, and the
    * table-level χ² + degrees of freedom repeated on every row — the
    * ranked per-cell attribution IS the operational deliverable (a
    * drift alarm without the offending cells is unactionable).
    *
    * Numerics: with d = O·G − R·C (exact BIGINT), the cell contribution
    * (O−E)²/E = d²/(G·R·C) and the expected count E = R·C/G are kept
    * EXACT by scaling to millionths and flooring: d² rides in
    * DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) — it overflows BIGINT
    * past ~3·10⁹ total rows — and the floor division is Spark's
    * integral `div` / DuckDB's `//`, both exact truncation of
    * positive exact integers. The table χ² is then a SUM OF EXACT
    * INTEGERS (order-independent — the trap a double Σ of per-cell
    * quotients would fall into), and df = (|types|−1)(|dows|−1) from
    * the same bounded frame.
    *
    * Scale shape: one map-side-combinable count to the ≤|types|·7 cell
    * grain; everything after is arithmetic on that bounded frame
    * (broadcast row/column totals). dow = pmod(epoch-day, 7) (0 =
    * Thursday — 1970-01-01), matching the oracle exactly: BOTH integer
    * steps (ns→ms, ms→day) are floor divisions and the weekday is the
    * POSITIVE mod, so pre-1970 timestamps land on the same 0..6 labels
    * in both engines instead of minting negative dow cells.
    */
  def chiSquareDrift(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    val dec = DecimalType(38, 0)
    val ms = OracleSafe.intDiv(col("ts_ns"), lit(1000000L))
    val day = OracleSafe.intDiv(ms, lit(86400000L))
    val sparse = events
      .select(col("event_type"), pmod(day, lit(7L)).as("dow"))
      .groupBy("event_type", "dow").agg(count(lit(1)).as("o"))
    val rowTot = sparse.groupBy("event_type").agg(sum("o").as("r_tot"))
    val colTot = sparse.groupBy("dow").agg(sum("o").as("c_tot"))
    val grand = sparse.agg(sum("o").as("g"),
      countDistinct("event_type").as("n_types"),
      countDistinct("dow").as("n_dows"))
    // DENSIFY: a never-observed (type, dow) cell still contributes
    // (0−E)²/E = E to the statistic — the sparse groupBy alone would
    // silently drop it and understate χ² (spec-pinned on a diagonal
    // table). The dense grid is marginals × marginals: bounded.
    val cells = broadcast(rowTot).crossJoin(broadcast(colTot))
      .join(sparse, Seq("event_type", "dow"), "left")
      .select(col("event_type"), col("dow"), col("r_tot"), col("c_tot"),
        coalesce(col("o"), lit(0L)).as("o"))
    // every product in decimal from the start: o·g alone overflows BIGINT
    // past ~3·10⁹ total rows
    val d = col("o").cast(dec) * col("g").cast(dec) -
      col("r_tot").cast(dec) * col("c_tot").cast(dec)
    val perCell = cells
      .crossJoin(broadcast(grand))
      .select(col("event_type"), col("dow"), col("o"),
        call_function("div",
          (col("r_tot") * col("c_tot")).cast(dec) * lit(1000000L),
          col("g").cast(dec)).as("e_e6"),
        call_function("div", d * d * lit(1000000L),
          (col("g").cast(dec) * col("r_tot").cast(dec)
            * col("c_tot").cast(dec))).as("contrib_e6"),
        ((col("n_types") - 1L) * (col("n_dows") - 1L)).as("df"))
    val total = broadcast(
      perCell.agg(sum("contrib_e6").as("chi2_e6")))
    perCell.crossJoin(total)
      .select(col("event_type"), col("dow"), col("o"), col("e_e6"),
        col("contrib_e6"), col("chi2_e6"), col("df"))
      .orderBy("event_type", "dow")
  }

  /** DuckDB twin of [[chiSquareDrift]] — the same scaled-integer floor
    * arithmetic in HUGEINT. Embed after `WITH ` and select from
    * `chi_square_drift`.
    */
  def chiSquareDriftSql(): String = {
    val day = OracleSafe.intDivSql("epoch_ms(ts)", "86400000")
    s"""cs_sparse AS (
       |  SELECT event_type, ((($day) % 7) + 7) % 7 AS dow, COUNT(*) AS o
       |  FROM events GROUP BY 1, 2),
       |cs_r AS (SELECT event_type, SUM(o) AS r_tot FROM cs_sparse GROUP BY 1),
       |cs_c AS (SELECT dow, SUM(o) AS c_tot FROM cs_sparse GROUP BY 1),
       |cs_g AS (
       |  SELECT SUM(o) AS g,
       |         COUNT(DISTINCT event_type) AS n_types,
       |         COUNT(DISTINCT dow) AS n_dows
       |  FROM cs_sparse),
       |cs_cells AS (
       |  SELECT r.event_type, c.dow, r.r_tot, c.c_tot,
       |         COALESCE(s.o, 0) AS o
       |  FROM cs_r r CROSS JOIN cs_c c
       |  LEFT JOIN cs_sparse s
       |    ON s.event_type = r.event_type AND s.dow = c.dow),
       |cs_per AS (
       |  SELECT event_type, dow, CAST(o AS BIGINT) AS o,
       |         CAST((CAST(r_tot AS HUGEINT) * CAST(c_tot AS HUGEINT)
       |                 * 1000000) // CAST(g AS HUGEINT) AS BIGINT) AS e_e6,
       |         CAST(((CAST(o AS HUGEINT) * CAST(g AS HUGEINT)
       |                  - CAST(r_tot AS HUGEINT) * CAST(c_tot AS HUGEINT))
       |                 * (CAST(o AS HUGEINT) * CAST(g AS HUGEINT)
       |                    - CAST(r_tot AS HUGEINT) * CAST(c_tot AS HUGEINT))
       |                 * 1000000)
       |               // (CAST(g AS HUGEINT) * CAST(r_tot AS HUGEINT)
       |                  * CAST(c_tot AS HUGEINT)) AS BIGINT) AS contrib_e6,
       |         CAST((n_types - 1) * (n_dows - 1) AS BIGINT) AS df
       |  FROM cs_cells
       |  CROSS JOIN cs_g),
       |chi_square_drift AS (
       |  SELECT event_type, dow, o, e_e6, contrib_e6,
       |         (SELECT CAST(SUM(contrib_e6) AS BIGINT) FROM cs_per)
       |           AS chi2_e6,
       |         df
       |  FROM cs_per)""".stripMargin
  }

  /** DuckDB twin of [[wilsonReturnRanking]] — the same expression, the
    * same operation order. Embed after `WITH ` and select from
    * `wilson_rank`.
    */
  def wilsonReturnRankingSql(k: Int = 20): String =
    s"""wr_counts AS (
       |  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n,
       |         CAST(COUNT(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT)
       |           AS r
       |  FROM lineitem GROUP BY 1),
       |wilson_rank AS (
       |  SELECT l_partkey, n, r,
       |         CAST(r AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
       |         ((CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
       |          + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE))
       |          - 1.96 * sqrt(((CAST(r AS DOUBLE) / CAST(n AS DOUBLE))
       |              * (1.0 - (CAST(r AS DOUBLE) / CAST(n AS DOUBLE)))
       |              + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE)))
       |            / CAST(n AS DOUBLE)))
       |         / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)) AS wilson_lb
       |  FROM wr_counts
       |  ORDER BY wilson_lb DESC, l_partkey
       |  LIMIT $k)""".stripMargin
}
