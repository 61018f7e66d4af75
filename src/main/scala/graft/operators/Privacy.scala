package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.OracleSafe

/** PII detection and redaction — the compliance pass every training-data
  * pipeline runs before text leaves curation (emails, phone numbers, IPs
  * scrubbed from crawl text). Pure column expressions over a regex rule
  * list: counts are computed per rule on the ORIGINAL text (so overlapping
  * rules each see the raw string) and the redacted text folds the
  * replacements in fixed rule order. Everything stays inside whole-stage
  * codegen — no UDF, no shuffle; at 100 TB this is a scan-only pass that
  * composes with column pruning (only the text column and the id are read).
  *
  * Regex dialect note: patterns here are written in the common subset of
  * Java regex (Spark) and RE2 (DuckDB oracle) — character classes, bounded
  * repetition, alternation; no backreferences, no lookaround — so the twin
  * engines match the same spans.
  */
object Privacy {

  /** One redaction rule: `name` labels the count column `n_<name>`. */
  final case class Rule(name: String, regex: String, replacement: String)

  /** Default rule set. The phone pattern matches the NN-NNN-NNN-NNNN shape
    * of the reference-adjacent TPC-H `c_phone` column; email/IP are the
    * standard crawl-scrubbing patterns.
    */
  val defaultRules: Seq[Rule] = Seq(
    Rule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    Rule("phone", "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}", "<PHONE>"),
    Rule("ip", "([0-9]{1,3}\\.){3}[0-9]{1,3}", "<IP>"))

  /** Per-row PII hit counts plus the redacted text. Output columns:
    * `idCols ++ rules.map(n_<name>) :+ redacted`.
    */
  def detectRedact(df: DataFrame, textCol: String, idCols: Seq[String],
      rules: Seq[Rule] = defaultRules): DataFrame = {
    val counts = rules.map(r =>
      regexp_count(col(textCol), lit(r.regex)).cast("long").as(s"n_${r.name}"))
    val redacted = rules.foldLeft(col(textCol)) { case (acc, r) =>
      regexp_replace(acc, r.regex, r.replacement)
    }
    df.select(idCols.map(col) ++ counts :+ redacted.as("redacted"): _*)
  }

  /** DuckDB twin of [[detectRedact]] given a FROM-able relation exposing
    * `idCols` and `textExpr`. Counts via `len(regexp_extract_all(...))`
    * (RE2 counts non-overlapping leftmost matches, same as Java's
    * `Matcher.find` loop backing Spark's `regexp_count`); replacement
    * needs DuckDB's explicit `'g'` flag — its `regexp_replace` is
    * first-match-only by default, unlike Spark's replace-all.
    */
  def detectRedactSql(from: String, textExpr: String, idCols: Seq[String],
      rules: Seq[Rule] = defaultRules): String = {
    def esc(s: String) = s.replace("'", "''")
    val counts = rules.map(r =>
      s"CAST(len(regexp_extract_all($textExpr, '${esc(r.regex)}')) AS BIGINT) AS n_${r.name}")
    val redacted = rules.foldLeft(textExpr) { case (acc, r) =>
      s"regexp_replace($acc, '${esc(r.regex)}', '${esc(r.replacement)}', 'g')"
    }
    s"""SELECT ${(idCols ++ counts).mkString(", ")},
       |       $redacted AS redacted
       |FROM $from""".stripMargin
  }

  /** k-anonymity audit over a generalization lattice (Sweeney 2002) — the
    * re-identification-risk gate a curation pipeline runs before customer
    * attributes enter a training set. Quasi-identifiers here: nation,
    * market segment, and the $1000 account-balance band; each lattice
    * level suppresses one more QI (band → segment → nation → everything).
    * Per level: group count, the SMALLEST group (the k the level actually
    * achieves), rows sitting in groups below `k` (the re-identifiable
    * population the level would leak), and whether the level satisfies
    * k-anonymity. Coarsening only merges groups, so `rows_at_risk` is
    * monotonically non-increasing up the lattice and the first satisfying
    * level is the minimal safe generalization.
    *
    * Scale shape: one map-side-combinable two-stage aggregate per level
    * (QI-grain then 1-row), lattice depth fixed at 4 regardless of data;
    * the QI grid is bounded by attribute domains, never row count. The
    * balance band is exact integer cents ÷ 100000 (floor), identical on
    * both engines.
    */
  def kAnonymityAudit(customer: DataFrame, k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import graft.functions.OracleSafe
    val base = customer.select(
      col("c_nationkey").cast("long").as("nat"),
      col("c_mktsegment").as("seg"),
      OracleSafe.intDiv(OracleSafe.quant(col("c_acctbal"), 100), lit(100000L))
        .as("band"))
    def level(lv: Int, qi: String, keys: Seq[Column]): DataFrame = {
      val grouped =
        if (keys.isEmpty) base.agg(count(lit(1)).as("cnt"))
        else base.groupBy(keys: _*).agg(count(lit(1)).as("cnt"))
      grouped.agg(count(lit(1)).as("n_groups"),
          min("cnt").as("min_group_size"),
          coalesce(sum(when(col("cnt") < k, col("cnt"))), lit(0L))
            .as("rows_at_risk"))
        .select(lit(lv).as("level"), lit(qi).as("qi"), col("n_groups"),
          col("min_group_size"), col("rows_at_risk"),
          (col("min_group_size") >= k).as("satisfies_k"))
    }
    level(0, "nation,segment,band", Seq(col("nat"), col("seg"), col("band")))
      .unionByName(level(1, "nation,segment", Seq(col("nat"), col("seg"))))
      .unionByName(level(2, "nation", Seq(col("nat"))))
      .unionByName(level(3, "*", Seq.empty))
      .orderBy("level")
  }

  /** l-diversity audit on the SAME generalization lattice as
    * [[kAnonymityAudit]] (Machanavajjhala et al. 2007) — k-anonymity's
    * necessary complement: a QI group can be large (k-safe) yet
    * HOMOGENEOUS in the sensitive attribute, so membership alone reveals
    * the secret. Sensitive attribute here: the $1000 balance band.
    * Per level: group count, the smallest number of DISTINCT sensitive
    * values any group achieves (the l the level actually delivers), rows
    * sitting in groups below `l` distinct values (the homogeneity-attack
    * population), and whether the level satisfies distinct-l-diversity.
    * Level 0 keeps the band IN the quasi-identifier, so every group is
    * trivially 1-diverse — the lattice's own demonstration that maximal
    * k-anonymity granularity and l-diversity pull in opposite directions.
    * Unlike k-anonymity, diversity is NOT monotone up the lattice in
    * general (merging groups unions their value sets, so per-group
    * diversity only grows when the merged groups differ) — except from
    * level 0, whose single-band groups always merge upward; the spec pins
    * exactly the monotone edges.
    *
    * Scale shape: one map-side two-stage aggregate per level — QI-grain
    * `(count, count distinct sensitive)` then a 1-row rollup; the
    * distinct is over a domain-bounded band, so the per-group state is
    * bounded by the band domain, never row count.
    */
  def lDiversityAudit(customer: DataFrame, l: Int = 3): DataFrame = {
    require(l >= 1, s"l must be >= 1, got $l")
    import graft.functions.OracleSafe
    val base = customer.select(
      col("c_nationkey").cast("long").as("nat"),
      col("c_mktsegment").as("seg"),
      OracleSafe.intDiv(OracleSafe.quant(col("c_acctbal"), 100), lit(100000L))
        .as("band"))
    def level(lv: Int, qi: String, keys: Seq[Column]): DataFrame = {
      val grouped =
        if (keys.isEmpty)
          base.agg(count(lit(1)).as("cnt"),
            countDistinct(col("band")).as("div"))
        else
          base.groupBy(keys: _*).agg(count(lit(1)).as("cnt"),
            countDistinct(col("band")).as("div"))
      grouped.agg(count(lit(1)).as("n_groups"),
          min("div").as("min_diversity"),
          coalesce(sum(when(col("div") < l, col("cnt"))), lit(0L))
            .as("rows_at_risk"))
        .select(lit(lv).as("level"), lit(qi).as("qi"), col("n_groups"),
          col("min_diversity"), col("rows_at_risk"),
          (col("min_diversity") >= l).as("satisfies_l"))
    }
    level(0, "nation,segment,band", Seq(col("nat"), col("seg"), col("band")))
      .unionByName(level(1, "nation,segment", Seq(col("nat"), col("seg"))))
      .unionByName(level(2, "nation", Seq(col("nat"))))
      .unionByName(level(3, "*", Seq.empty))
      .orderBy("level")
  }

  /** DuckDB twin of [[lDiversityAudit]]; embed after `WITH ` and select
    * from `l_diversity`.
    */
  def lDiversityAuditSql(l: Int = 3): String = {
    import graft.functions.OracleSafe
    val band = OracleSafe.intDivSql(OracleSafe.quantSql("c_acctbal", 100), "100000")
    def lvl(lv: Int, qi: String, cte: String) =
      s"""  SELECT $lv AS level, '$qi' AS qi, COUNT(*) AS n_groups,
         |         MIN(div) AS min_diversity,
         |         CAST(COALESCE(SUM(CASE WHEN div < $l THEN cnt END), 0) AS BIGINT)
         |           AS rows_at_risk,
         |         MIN(div) >= $l AS satisfies_l
         |  FROM $cte""".stripMargin
    s"""ld_base AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
       |         $band AS band
       |  FROM customer),
       |ld_l0 AS (SELECT COUNT(*) AS cnt, CAST(COUNT(DISTINCT band) AS BIGINT) AS div
       |          FROM ld_base GROUP BY nat, seg, band),
       |ld_l1 AS (SELECT COUNT(*) AS cnt, CAST(COUNT(DISTINCT band) AS BIGINT) AS div
       |          FROM ld_base GROUP BY nat, seg),
       |ld_l2 AS (SELECT COUNT(*) AS cnt, CAST(COUNT(DISTINCT band) AS BIGINT) AS div
       |          FROM ld_base GROUP BY nat),
       |ld_l3 AS (SELECT COUNT(*) AS cnt, CAST(COUNT(DISTINCT band) AS BIGINT) AS div
       |          FROM ld_base),
       |l_diversity AS (
       |${lvl(0, "nation,segment,band", "ld_l0")}
       |  UNION ALL
       |${lvl(1, "nation,segment", "ld_l1")}
       |  UNION ALL
       |${lvl(2, "nation", "ld_l2")}
       |  UNION ALL
       |${lvl(3, "*", "ld_l3")})""".stripMargin
  }

  /** The [[kAnonymityAudit]] CONSUMED — anonymization executed, not just
    * audited (the planner tier's q208/q212 pattern applied to privacy):
    * the 4-row audit is the PLAN frame, the first level that satisfies k
    * is the minimal safe generalization (monotonicity makes "first"
    * well-defined), and the release applies exactly that level's
    * suppression — band first, then segment, then nation — emitting the
    * generalized QI groups with their sizes. Every released group
    * carries n ≥ k BY CONSTRUCTION of the chosen level (the audit's
    * `min_group_size ≥ k` at that level IS the certificate, and the
    * spec re-checks it on the released rows). If even full suppression
    * cannot reach k (fewer than k rows in total), NOTHING is released —
    * the only safe answer.
    *
    * Output: one row per released group — the chosen `level`, the
    * generalized `nat_g`/`seg_g`/`band_g` (suppressed positions show
    * `*`), and the group size `n`. Rows are bounded by the QI domain at
    * the chosen level, never by row count.
    *
    * Scale shape: the audit pass (4 domain-bounded aggregates), one
    * 4-row collect for the level pick, then a single map-side-combinable
    * group-by at the chosen grain.
    */
  def anonymizeToK(customer: DataFrame, k: Int = 5): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    import graft.functions.OracleSafe
    val base = customer.select(
      col("c_nationkey").cast("long").as("nat"),
      col("c_mktsegment").as("seg"),
      OracleSafe.intDiv(OracleSafe.quant(col("c_acctbal"), 100), lit(100000L))
        .as("band"))
    // 4-row plan frame: the audit is the decision input, not data
    val levels = kAnonymityAudit(customer, k)
      .filter(col("satisfies_k")).agg(min("level").as("lv")).head()
    val generalized =
      if (levels.isNullAt(0)) base.filter(lit(false)).select(
        lit(-1).as("level"), lit("*").as("nat_g"), lit("*").as("seg_g"),
        lit("*").as("band_g"))
      else {
        val lv = levels.getInt(0)
        base.select(lit(lv).as("level"),
          (if (lv <= 2) col("nat").cast("string") else lit("*")).as("nat_g"),
          (if (lv <= 1) col("seg") else lit("*")).as("seg_g"),
          (if (lv == 0) col("band").cast("string") else lit("*")).as("band_g"))
      }
    generalized.groupBy("level", "nat_g", "seg_g", "band_g")
      .agg(count(lit(1)).as("n"))
      .orderBy("nat_g", "seg_g", "band_g")
  }

  /** DuckDB twin of [[anonymizeToK]]; embed after `WITH ` and select
    * from `anonymized`.
    */
  def anonymizeToKSql(k: Int = 5): String =
    s"""${kAnonymityAuditSql(k)},
       |an_lv AS (
       |  SELECT MIN(level) AS lv FROM k_anonymity WHERE satisfies_k),
       |anonymized AS (
       |  SELECT lv AS level,
       |         CASE WHEN lv <= 2 THEN CAST(nat AS VARCHAR) ELSE '*' END AS nat_g,
       |         CASE WHEN lv <= 1 THEN seg ELSE '*' END AS seg_g,
       |         CASE WHEN lv = 0 THEN CAST(band AS VARCHAR) ELSE '*' END AS band_g,
       |         COUNT(*) AS n
       |  FROM ka_base, an_lv
       |  WHERE lv IS NOT NULL
       |  GROUP BY 1, 2, 3, 4)""".stripMargin

  /** t-closeness audit on the SAME generalization lattice (Li, Li &
    * Venkatasubramanian 2007) — the third member of the privacy trio:
    * l-diversity counts distinct sensitive values but ignores HOW they
    * are distributed, so a group whose balance bands are all clustered
    * at the top still leaks "this person is rich". t-closeness bounds,
    * per QI group, the Earth-Mover's Distance between the group's
    * sensitive distribution and the GLOBAL one; for the ordered band
    * attribute EMD is the normalized sum of absolute cumulative
    * differences, (1/(m−1))·Σ_i |Σ_{j≤i}(p_j − q_j)|. Per level: group
    * count, the worst (max) EMD any group shows, rows in groups whose
    * EMD exceeds `t = tNum/tDen`, and whether the level satisfies
    * t-closeness. Level 0's point-mass groups (band IS the QI) show the
    * largest distances; the all-merged level 3 is the global
    * distribution itself, EMD exactly 0.
    *
    * Cross-engine exactness: EMD comparisons run in EXACT integers —
    * p_j − q_j = (cnt_gj·N − C_j·n_g)/(n_g·N), so the scaled score
    * S_g = Σ_i |Σ_{j≤i}(cnt_gj·N − C_j·n_g)| is a BIGINT and
    * "EMD > t" is S_g·tDen > tNum·(m−1)·n_g·N with no floats anywhere
    * (overflow headroom: terms are ≤ B·N², ~2·10¹⁵ at N = 6·10⁶);
    * only the reported `max_emd` is a double — one division of exact
    * operands per group, then an order-independent max.
    *
    * Scale shape: per level one (group × band) aggregate plus a window
    * over the domain-bounded grid (groups × bands, never rows); the
    * global distribution is a B-row broadcast; the level rollup is
    * 1 row.
    */
  def tClosenessAudit(customer: DataFrame, tNum: Long = 1,
      tDen: Long = 4): DataFrame = {
    require(tNum >= 0 && tDen >= 1, s"need t = tNum/tDen >= 0, got $tNum/$tDen")
    import graft.functions.OracleSafe
    import org.apache.spark.sql.expressions.Window
    val base = customer.select(
      col("c_nationkey").cast("long").as("nat"),
      col("c_mktsegment").as("seg"),
      OracleSafe.intDiv(OracleSafe.quant(col("c_acctbal"), 100), lit(100000L))
        .as("band"))
    val glob = base.groupBy("band").agg(count(lit(1)).as("c_j"))
    val tot = base.agg(count(lit(1)).as("n_tot"),
      countDistinct(col("band")).as("m"))
    def level(lv: Int, qi: String, gkey: Column): DataFrame = {
      val b = base.withColumn("g", gkey)
      val gsize = b.groupBy("g").agg(count(lit(1)).as("n_g"))
      val gcnt = b.groupBy("g", "band").agg(count(lit(1)).as("cnt"))
      val grid = gsize.crossJoin(broadcast(glob))
        .join(gcnt, Seq("g", "band"), "left")
        .withColumn("cnt", coalesce(col("cnt"), lit(0L)))
        .crossJoin(broadcast(tot))
        .withColumn("d", col("cnt") * col("n_tot") - col("c_j") * col("n_g"))
      val cum = grid.withColumn("cum",
        sum("d").over(Window.partitionBy("g").orderBy("band")
          .rowsBetween(Window.unboundedPreceding, 0)))
      val sg = cum.groupBy("g").agg(
        max("n_g").as("n_g"), max("n_tot").as("n_tot"), max("m").as("m"),
        sum(abs(col("cum"))).as("s_g"))
      val den = (col("m") - 1) * col("n_g") * col("n_tot")
      val emd = when(col("m") === 1, lit(0.0))
        .otherwise(col("s_g").cast("double") / den.cast("double"))
      val exceeds = col("m") > 1 && col("s_g") * tDen > lit(tNum) * den
      sg.agg(count(lit(1)).as("n_groups"), max(emd).as("max_emd"),
          coalesce(sum(when(exceeds, col("n_g"))), lit(0L)).as("rows_at_risk"))
        .select(lit(lv).as("level"), lit(qi).as("qi"), col("n_groups"),
          col("max_emd"), col("rows_at_risk"),
          (col("rows_at_risk") === 0L).as("satisfies_t"))
    }
    val sep = "\u0001" // unambiguous group-key separator (chr(1) in the twin)
    level(0, "nation,segment,band",
        concat_ws(sep, col("nat"), col("seg"), col("band")))
      .unionByName(level(1, "nation,segment",
        concat_ws(sep, col("nat"), col("seg"))))
      .unionByName(level(2, "nation", col("nat").cast("string")))
      .unionByName(level(3, "*", lit("*")))
      .orderBy("level")
  }

  /** DuckDB twin of [[tClosenessAudit]]; embed after `WITH ` and select
    * from `t_closeness`.
    */
  def tClosenessAuditSql(tNum: Long = 1, tDen: Long = 4): String = {
    import graft.functions.OracleSafe
    val band = OracleSafe.intDivSql(OracleSafe.quantSql("c_acctbal", 100), "100000")
    def lvl(lv: Int, qi: String, gexpr: String) =
      s"""tc_g$lv AS (
         |  SELECT $gexpr AS g, band FROM tc_base),
         |tc_gs$lv AS (SELECT g, COUNT(*) AS n_g FROM tc_g$lv GROUP BY g),
         |tc_gc$lv AS (SELECT g, band, COUNT(*) AS cnt FROM tc_g$lv GROUP BY g, band),
         |tc_cum$lv AS (
         |  SELECT s.g, s.n_g,
         |         SUM(COALESCE(c.cnt, 0) * t.n_tot - gl.c_j * s.n_g)
         |           OVER (PARTITION BY s.g ORDER BY gl.band
         |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         |         t.n_tot, t.m
         |  FROM tc_gs$lv s CROSS JOIN tc_glob gl
         |  LEFT JOIN tc_gc$lv c ON c.g = s.g AND c.band = gl.band
         |  CROSS JOIN tc_tot t),
         |tc_sg$lv AS (
         |  SELECT g, MAX(n_g) AS n_g, MAX(n_tot) AS n_tot, MAX(m) AS m,
         |         CAST(SUM(ABS(cum)) AS BIGINT) AS s_g
         |  FROM tc_cum$lv GROUP BY g),
         |tc_lv$lv AS (
         |  SELECT $lv AS level, '$qi' AS qi, COUNT(*) AS n_groups,
         |         MAX(CASE WHEN m = 1 THEN 0.0
         |             ELSE CAST(s_g AS DOUBLE)
         |                  / CAST((m - 1) * n_g * n_tot AS DOUBLE) END) AS max_emd,
         |         CAST(COALESCE(SUM(CASE WHEN m > 1
         |                AND s_g * $tDen > $tNum * (m - 1) * n_g * n_tot
         |                THEN n_g END), 0) AS BIGINT) AS rows_at_risk,
         |         COALESCE(SUM(CASE WHEN m > 1
         |                AND s_g * $tDen > $tNum * (m - 1) * n_g * n_tot
         |                THEN n_g END), 0) = 0 AS satisfies_t
         |  FROM tc_sg$lv)""".stripMargin
    val g0 = "CAST(nat AS VARCHAR) || chr(1) || seg || chr(1) || CAST(band AS VARCHAR)"
    val g1 = "CAST(nat AS VARCHAR) || chr(1) || seg"
    val g2 = "CAST(nat AS VARCHAR)"
    val g3 = "'*'"
    s"""tc_base AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
       |         $band AS band
       |  FROM customer),
       |tc_glob AS (SELECT band, COUNT(*) AS c_j FROM tc_base GROUP BY band),
       |tc_tot AS (SELECT COUNT(*) AS n_tot,
       |                  CAST(COUNT(DISTINCT band) AS BIGINT) AS m FROM tc_base),
       |${lvl(0, "nation,segment,band", g0)},
       |${lvl(1, "nation,segment", g1)},
       |${lvl(2, "nation", g2)},
       |${lvl(3, "*", g3)},
       |t_closeness AS (
       |  SELECT * FROM tc_lv0
       |  UNION ALL SELECT * FROM tc_lv1
       |  UNION ALL SELECT * FROM tc_lv2
       |  UNION ALL SELECT * FROM tc_lv3)""".stripMargin
  }

  /** DuckDB twin of [[kAnonymityAudit]]; embed after `WITH ` and select
    * from `k_anonymity`.
    */
  def kAnonymityAuditSql(k: Int = 5): String = {
    import graft.functions.OracleSafe
    val band = OracleSafe.intDivSql(OracleSafe.quantSql("c_acctbal", 100), "100000")
    def lvl(lv: Int, qi: String, cte: String) =
      s"""  SELECT $lv AS level, '$qi' AS qi, COUNT(*) AS n_groups,
         |         MIN(cnt) AS min_group_size,
         |         CAST(COALESCE(SUM(CASE WHEN cnt < $k THEN cnt END), 0) AS BIGINT)
         |           AS rows_at_risk,
         |         MIN(cnt) >= $k AS satisfies_k
         |  FROM $cte""".stripMargin
    s"""ka_base AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
       |         $band AS band
       |  FROM customer),
       |ka_l0 AS (SELECT COUNT(*) AS cnt FROM ka_base GROUP BY nat, seg, band),
       |ka_l1 AS (SELECT COUNT(*) AS cnt FROM ka_base GROUP BY nat, seg),
       |ka_l2 AS (SELECT COUNT(*) AS cnt FROM ka_base GROUP BY nat),
       |ka_l3 AS (SELECT COUNT(*) AS cnt FROM ka_base),
       |k_anonymity AS (
       |${lvl(0, "nation,segment,band", "ka_l0")}
       |  UNION ALL
       |${lvl(1, "nation,segment", "ka_l1")}
       |  UNION ALL
       |${lvl(2, "nation", "ka_l2")}
       |  UNION ALL
       |${lvl(3, "*", "ka_l3")})""".stripMargin
  }

  // ---------------------------------------------------------------- q274

  /** 8-bit noise-table index from the md5 of a release-qualified key —
    * the same md5-prefix construction as the planner's h48, folded to
    * the table's 256 bins.
    */
  private def noiseIdx(c: Column): Column =
    conv(substring(md5(c), 1, 2), 16, 10).cast("long")

  /** Standard-Laplace quantile at the 256 bin midpoints, fixed-point
    * ×10⁶ — computed ONCE in Scala and embedded as literals in BOTH
    * plans, so no engine's libm ever decides a released value (the
    * q228/q230 frozen-literal discipline). Range ±5.55 at the edge
    * midpoints (u = 1/512), so noise is bounded — a truncated-Laplace
    * mechanism, documented as such.
    */
  private lazy val laplaceQfp: IndexedSeq[Long] = (0 until 256).map { i =>
    val u = (i + 0.5) / 256.0
    val q = if (u < 0.5) math.log(2.0 * u) else -math.log(2.0 * (1.0 - u))
    math.round(q * 1e6)
  }

  /** q274 — DIFFERENTIALLY-PRIVATE histogram release with budget
    * accounting: two counting releases over events (per type, and per
    * type × weekday), each perturbed by Laplace(Δ=1, ε=1/2) noise and
    * both charged to one ε=1 budget — sequential composition made
    * visible as data. The noise is drawn DETERMINISTICALLY for the
    * oracle's sake: an md5 of the release-qualified group key indexes a
    * 256-bin truncated-Laplace quantile table frozen as fixed-point
    * literals in both plans. Two caveats separate this from a certified
    * release: (1) the hash-indexed draw stands in for a real RNG, and
    * (2) the quantile table TRUNCATES the noise to ±2·ln(256) ≈ 11.1
    * (the bin-midpoint extremes × the ε=1/2 scale), and truncated
    * Laplace does NOT satisfy the pure-ε guarantee the budget ledger
    * charges — the ε accounting here is NOMINAL for the untruncated
    * mechanism; a deployment would either draw unbounded Laplace or
    * account the clipped tail mass (≤ 2/256 per draw) as a δ term.
    * Sensitivity, scale, sequential composition, and post-processing
    * are otherwise the standard mechanism. Event-level DP (Δ = 1 per
    * event).
    *
    * Scale: two map-side-combinable counting aggregates plus a 256-row
    * broadcast; noise injection is arithmetic on the group frame. The
    * `true_n` column is the test oracle's audit and would be dropped
    * (with the released floats post-processed to ≥0) in production.
    */
  def dpHistogramRelease(events: DataFrame): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val noise = broadcast(laplaceQfp.zipWithIndex
      .map { case (q, i) => (i.toLong, q) }.toDF("nidx", "qfp"))
    // eps = 1/2 per release and Δ = 1 → noise = standard quantile × 2
    def release(name: String, grouped: DataFrame): DataFrame = grouped
      .withColumn("nidx", noiseIdx(concat_ws("|", lit(name), col("key"))))
      .join(noise, Seq("nidx"))
      .select(lit(name).as("section"), col("key"),
        col("true_n"), (col("qfp") * 2L).as("noise_fp"),
        ((col("true_n") * 1000000L + col("qfp") * 2L).cast("double")
          / lit(1000000.0)).as("released"),
        lit(1L).as("eps_num"), lit(2L).as("eps_den"))
    val byType = events.groupBy(col("event_type").as("key"))
      .agg(count(lit(1)).as("true_n"))
    val byTypeDow = events.groupBy(concat_ws(":", col("event_type"),
        (OracleSafe.intDiv(expr("ts_ns DIV 1000000"), lit(86400000L)) % 7)
          .cast("string")).as("key"))
      .agg(count(lit(1)).as("true_n"))
    val budget = spark.range(1).select(lit("budget").as("section"),
      lit("total_consumed").as("key"), lit(null).cast("long").as("true_n"),
      lit(null).cast("long").as("noise_fp"),
      lit(null).cast("double").as("released"),
      lit(1L).as("eps_num"), lit(1L).as("eps_den"))
    release("by_type", byType)
      .unionByName(release("by_type_dow", byTypeDow))
      .unionByName(budget)
      .orderBy("section", "key")
  }

  /** DuckDB twin of [[dpHistogramRelease]] — the identical frozen noise
    * table as VALUES literals. Embed after `WITH ` and select from
    * `dp_release`.
    */
  def dpHistogramReleaseSql(): String = {
    val vals = laplaceQfp.zipWithIndex
      .map { case (q, i) => s"($i, $q)" }.mkString(", ")
    def releaseSql(name: String, groupedCte: String) =
      s"""SELECT '$name' AS section, g.key, g.true_n,
         |       n.qfp * 2 AS noise_fp,
         |       CAST(g.true_n * 1000000 + n.qfp * 2 AS DOUBLE) / 1000000.0
         |         AS released,
         |       CAST(1 AS BIGINT) AS eps_num, CAST(2 AS BIGINT) AS eps_den
         |FROM $groupedCte g JOIN dp_noise n
         |  ON n.nidx = ('0x' || substring(md5('$name' || '|' || g.key), 1, 2))::BIGINT""".stripMargin
    s"""dp_noise(nidx, qfp) AS (VALUES $vals),
       |dp_by_type AS (
       |  SELECT event_type AS key, CAST(COUNT(*) AS BIGINT) AS true_n
       |  FROM events GROUP BY 1),
       |dp_by_type_dow AS (
       |  SELECT event_type || ':' ||
       |         CAST((epoch_ms(ts) // 86400000) % 7 AS VARCHAR) AS key,
       |         CAST(COUNT(*) AS BIGINT) AS true_n
       |  FROM events GROUP BY 1),
       |dp_release AS (
       |${releaseSql("by_type", "dp_by_type")}
       |  UNION ALL
       |${releaseSql("by_type_dow", "dp_by_type_dow")}
       |  UNION ALL
       |  SELECT 'budget', 'total_consumed', CAST(NULL AS BIGINT),
       |         CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE),
       |         CAST(1 AS BIGINT), CAST(1 AS BIGINT))""".stripMargin
  }
}
