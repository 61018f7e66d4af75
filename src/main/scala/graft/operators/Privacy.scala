package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
}
