package graft

import org.apache.spark.sql.functions.col

/** Driver-contract smoke: entry() returns rows; every declared query has an
  * oracle or is consciously rows-only; names match between the two maps.
  */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle entry has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("every query has an oracle (full-strength correctness for all ops)") {
    val weak = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(weak.isEmpty, s"queries with rows-only checks: $weak")
  }

  test("q140: referential checks are clean; the audit still REPORTS data truth") {
    val rows = SparkEntry.queries("q140_tpch_integrity")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.size == 9)
    // every FK resolves in the synthetic feed
    rows.filter(_._1.endsWith("orphans")).foreach { case (name, v) =>
      assert(v == 0L, s"$name = $v")
    }
    // the generator does NOT enforce the lineitem compound PK — the audit
    // must report that fact, not hide it
    assert(rows("lineitem pk dups") > 0L)
  }

  test("all queries run and are non-degenerate on sf0.001") {
    val allowedEmpty = Set("q47_embedding_near_dups") // no near-dup pairs at this sf
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0 || allowedEmpty(name), s"$name returned 0 rows")
    }
  }
}
