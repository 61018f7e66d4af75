package graft.operators

import graft.SparkSpec

/** Generic FD-audit semantics (the bank FK/PK sweep has its own suites). */
class FdAuditSpec extends SparkSpec {
  import spark.implicits._

  test("fdAudit counts violating groups and worst fan-out") {
    val df = Seq((1L, "a"), (2L, "a"), (2L, "b"), (3L, "c"), (3L, "c"))
      .toDF("k", "v")
    val r = DataQuality.fdAudit(df, Seq(("k_to_v", "k", "v")))
      .as[(String, Long, Long, Long)].collect().toSeq
    // groups: 1->{a}, 2->{a,b} (violates), 3->{c} -> 3 groups, 1 bad, max 2
    assert(r == Seq(("k_to_v", 3L, 1L, 2L)))
  }

  test("fdAudit rejects duplicate FD names") {
    val df = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException](
      DataQuality.fdAudit(df, Seq(("x", "k", "v"), ("x", "v", "k"))))
  }

  test("expectationSuite: every rule fires with the exact violation count") {
    // 6 corrupted orders: one per rule class (+1 extra dup to vary counts)
    val orders = Seq(
      (1L, Some(10L), "O", 50.0, "1-URGENT"),   // clean
      (2L, None, "O", 50.0, "2-HIGH"),          // null custkey
      (3L, Some(10L), "X", 50.0, "3-MEDIUM"),   // bad status
      (4L, Some(10L), "F", -5.0, "4-NOT SPECIFIED"), // non-positive price
      (5L, Some(10L), "P", 50.0, "URGENT"),     // bad priority pattern
      (5L, Some(10L), "O", 50.0, "5-LOW"),      // dup orderkey
      (6L, Some(99L), "O", 50.0, "5-LOW"))      // unresolvable custkey
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
    val customer = Seq(10L).toDF("c_custkey")
    val r = DataQuality.expectationSuite(orders, customer)
      .orderBy("expectation")
      .as[(String, String, Long, Long, Boolean)].collect().toSeq
    assert(r == Seq(
      ("accepted_values", "o_orderstatus", 7L, 1L, false),
      ("not_null", "o_custkey", 7L, 1L, false),
      ("pattern", "o_orderpriority", 7L, 1L, false),
      ("positive", "o_totalprice", 7L, 1L, false),
      // 2: the unresolvable key AND the null key (a null cannot equi-join,
      // so it lands under both not_null and relationship — see next test)
      ("relationship", "o_custkey->customer", 7L, 2L, false),
      ("unique", "o_orderkey", 7L, 1L, false)),
      s"every rule must fire on the crafted corruption: $r")
  }

  test("expectationSuite: relationship ignores null keys (they are not_null's job)") {
    val orders = Seq((1L, Option.empty[Long], "O", 1.0, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderpriority")
    val customer = Seq(10L).toDF("c_custkey")
    val rel = DataQuality.expectationSuite(orders, customer)
      .filter($"expectation" === "relationship")
      .select("n_violations").as[Long].head()
    // a NULL o_custkey cannot equi-join, so the anti-join keeps it — the
    // suite reports it under BOTH not_null and relationship; pin that
    // (documented) overlap so a change is a conscious one
    assert(rel == 1L)
  }
}
