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
}
