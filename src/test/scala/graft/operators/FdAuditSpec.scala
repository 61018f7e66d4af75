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
}
