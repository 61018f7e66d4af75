package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Execution-planning operators: profiles and sketches whose OUTPUT is a
  * planning decision (how to salt a shuffle, how big a join will be), not
  * an analytics answer. At 100 TB these run as cheap pre-passes — a
  * partial-aggregatable count or a constant-size sketch — so the expensive
  * job that follows is shaped by measurement instead of guesswork.
  */
object Planning {

  /** Data-driven salting plan for a skewed shuffle key: per-key row count
    * and the salt fan-out `ceil(n / targetRowsPerSalt)` (capped at
    * `maxSalt`, the parallelism actually available) that spreads the key's
    * rows into ~target-sized salt buckets. This is q70's manual salting
    * turned into a measured decision — joinable back onto the fact as a
    * broadcast (the plan has one row per distinct key) so the salted
    * repartition uses `pmod(hash(row_key), salt_factor)` per key.
    *
    * Scale shape: one map-side-combinable groupBy on the key; integer
    * ceiling division `(n + t - 1) DIV t` is exact on both engines. The
    * plan frame is bounded by key cardinality — broadcastable whenever
    * salting is relevant at all (skew means FEW hot keys).
    */
  def skewPlan(df: DataFrame, key: String, targetRowsPerSalt: Long,
      maxSalt: Int = 32): DataFrame = {
    require(targetRowsPerSalt >= 1, s"target must be >= 1, got $targetRowsPerSalt")
    require(maxSalt >= 1, s"maxSalt must be >= 1, got $maxSalt")
    df.groupBy(col(key)).agg(count(lit(1)).as("n"))
      .withColumn("salt_factor",
        least(lit(maxSalt.toLong),
          expr(s"(n + ${targetRowsPerSalt - 1}) DIV $targetRowsPerSalt")))
  }

  /** DuckDB twin of [[skewPlan]]; embed after `WITH` and select from
    * `skew_plan`.
    */
  def skewPlanSql(table: String, key: String, targetRowsPerSalt: Long,
      maxSalt: Int = 32): String =
    s"""skew_plan AS (
       |  SELECT $key, COUNT(*) AS n,
       |         LEAST($maxSalt, (COUNT(*) + ${targetRowsPerSalt - 1}) // $targetRowsPerSalt)
       |           AS salt_factor
       |  FROM $table GROUP BY 1)""".stripMargin

  /** 48-bit uniform key hash — same md5-prefix construction as the shingle
    * ids ([[Dedup]]), identical in both engines.
    */
  private def h48(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 12), 16, 10).cast("long")

  private def bottomK(keys: DataFrame, k: Int): DataFrame =
    graft.plans.TopK.perKey(keys.withColumn("g", lit(1)), Seq("g"),
      Seq(graft.plans.TopK.asc("h")), k = k, rankName = "rk")
      .select("h")

  /** Join-cardinality estimation from two KMV sketches (the q145 sketch
    * applied to its classic planning use, Bar-Yossef et al. 2002 / Beyer
    * et al. 2007): how many DISTINCT join keys do sides A and B share,
    * without ever joining them? Bottom-k sketches of each side's hashed
    * key set merge into a bottom-k of the union; the fraction ρ of merged
    * sketch members present in BOTH side sketches estimates the Jaccard
    * similarity, and ρ · est|A∪B| estimates the key overlap — the number
    * that decides broadcast-vs-shuffle and sizes a shuffle join's output
    * before running it.
    *
    * Cross-engine exactness (the q145 argument, extended): the sketch
    * members are integers both engines agree on; `k` is a power of two so
    * ρ = n_both/k is an EXACT double; est|A∪B| is (k−1)·2⁴⁸ / h_k with
    * both operands exact; the final product of two doubles is correctly
    * rounded on identical inputs. When the union has fewer than k distinct
    * hashes the sketch IS the union and the estimate is the exact sketch
    * intersection count. So estimate, exact audit counts, and rel_err all
    * hash-match the oracle.
    *
    * Output (one row): n_a / n_b / n_inter exact distinct-key counts (the
    * audit — a 100 TB deployment would drop these and keep only the
    * sketches), union_estimate, inter_estimate, rel_err (NULL when the
    * true intersection is empty).
    *
    * Scale shape: each side costs one distinct + a bounded-heap bottom-k
    * ([[graft.plans.TopK.perKey]] — map-side partial heaps, k·8 bytes per
    * partition); sketches of shards merge associatively, so per-shard
    * sketches roll up without touching row data again.
    */
  def kmvJoinOverlap(a: DataFrame, b: DataFrame, key: String,
      k: Int = 256): DataFrame = {
    require(k >= 2 && (k & (k - 1)) == 0,
      s"k must be a power of two >= 2 for exact rho division, got $k")
    val ha = a.select(h48(col(key)).as("h")).distinct()
    val hb = b.select(h48(col(key)).as("h")).distinct()
    val ka = bottomK(ha, k).cache()
    val kb = bottomK(hb, k).cache()
    val merged = bottomK(ka.union(kb).distinct(), k)
    val flagged = merged
      .join(broadcast(ka.withColumn("in_a", lit(1L))), Seq("h"), "left")
      .join(broadcast(kb.withColumn("in_b", lit(1L))), Seq("h"), "left")
    val stats = flagged.agg(
      count(lit(1)).as("n_m"), max("h").as("h_k"),
      sum(when(col("in_a").isNotNull && col("in_b").isNotNull, 1L)
        .otherwise(0L)).as("n_both"))
    val exact = ha.withColumn("ea", lit(1L))
      .join(hb.withColumn("eb", lit(1L)), Seq("h"), "full")
      .agg(sum(coalesce(col("ea"), lit(0L))).as("n_a"),
        sum(coalesce(col("eb"), lit(0L))).as("n_b"),
        sum(when(col("ea").isNotNull && col("eb").isNotNull, 1L)
          .otherwise(0L)).as("n_inter"))
    val unionEst = when(col("n_m") < k, col("n_m").cast("double"))
      .otherwise(lit((k - 1).toLong << 48).cast("double") / col("h_k").cast("double"))
    val interEst = when(col("n_m") < k, col("n_both").cast("double"))
      .otherwise((col("n_both").cast("double") / lit(k.toDouble)) * unionEst)
    exact.crossJoin(broadcast(stats))
      .select(col("n_a"), col("n_b"), col("n_inter"),
        unionEst.as("union_estimate"), interEst.as("inter_estimate"))
      .withColumn("rel_err",
        when(col("n_inter") === 0L, lit(null).cast("double"))
          .otherwise(abs(col("inter_estimate") - col("n_inter").cast("double"))
            / col("n_inter").cast("double")))
  }

  /** DuckDB twin of [[kmvJoinOverlap]]: `sideASql`/`sideBSql` are queries
    * each yielding one column `key` (stringified identically to the Spark
    * side's `cast("string")`); embed after `WITH` and select from
    * `kmv_overlap`.
    */
  def kmvJoinOverlapSql(sideASql: String, sideBSql: String, k: Int = 256): String = {
    require(k >= 2 && (k & (k - 1)) == 0, s"k must be a power of two, got $k")
    val max48 = (k - 1).toLong << 48
    s"""ov_a AS (
       |  SELECT DISTINCT ('0x' || substring(md5(key), 1, 12))::BIGINT AS h
       |  FROM ($sideASql) sa),
       |ov_b AS (
       |  SELECT DISTINCT ('0x' || substring(md5(key), 1, 12))::BIGINT AS h
       |  FROM ($sideBSql) sb),
       |ov_ka AS (SELECT h FROM (
       |  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rk FROM ov_a) WHERE rk <= $k),
       |ov_kb AS (SELECT h FROM (
       |  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rk FROM ov_b) WHERE rk <= $k),
       |ov_m AS (SELECT h FROM (
       |  SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rk
       |  FROM (SELECT h FROM ov_ka UNION SELECT h FROM ov_kb) u) WHERE rk <= $k),
       |ov_stats AS (
       |  SELECT COUNT(*) AS n_m, MAX(h) AS h_k,
       |         SUM(CASE WHEN h IN (SELECT h FROM ov_ka)
       |                   AND h IN (SELECT h FROM ov_kb) THEN 1 ELSE 0 END) AS n_both
       |  FROM ov_m),
       |ov_exact AS (
       |  SELECT SUM(CASE WHEN a.h IS NOT NULL THEN 1 ELSE 0 END) AS n_a,
       |         SUM(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS n_b,
       |         SUM(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL THEN 1 ELSE 0 END) AS n_inter
       |  FROM ov_a a FULL JOIN ov_b b USING (h)),
       |kmv_overlap AS (
       |  SELECT CAST(e.n_a AS BIGINT) AS n_a, CAST(e.n_b AS BIGINT) AS n_b,
       |         CAST(e.n_inter AS BIGINT) AS n_inter,
       |         CASE WHEN s.n_m < $k THEN CAST(s.n_m AS DOUBLE)
       |              ELSE CAST($max48 AS DOUBLE) / CAST(s.h_k AS DOUBLE) END
       |           AS union_estimate,
       |         CASE WHEN s.n_m < $k THEN CAST(s.n_both AS DOUBLE)
       |              ELSE (CAST(s.n_both AS DOUBLE) / $k.0)
       |                   * (CAST($max48 AS DOUBLE) / CAST(s.h_k AS DOUBLE)) END
       |           AS inter_estimate,
       |         CASE WHEN e.n_inter = 0 THEN NULL
       |              ELSE ABS((CASE WHEN s.n_m < $k THEN CAST(s.n_both AS DOUBLE)
       |                        ELSE (CAST(s.n_both AS DOUBLE) / $k.0)
       |                             * (CAST($max48 AS DOUBLE) / CAST(s.h_k AS DOUBLE)) END)
       |                       - CAST(e.n_inter AS DOUBLE)) / CAST(e.n_inter AS DOUBLE) END
       |           AS rel_err
       |  FROM ov_exact e, ov_stats s)""".stripMargin
  }
}
