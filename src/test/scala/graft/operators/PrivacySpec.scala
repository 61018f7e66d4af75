package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** PII detection/redaction: counts on the original text, ordered
  * replace-all redaction, zero-hit passthrough.
  */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private def run(txt: String) =
    Privacy.detectRedact(Seq((1L, txt)).toDF("id", "txt"), "txt", Seq("id"))
      .collect().head

  test("counts and redacts every rule, all occurrences") {
    val r = run("mail a.b@x.io or c_d%e@y.co call 12-345-678-9012 from 10.0.0.1 end")
    assert(r.getAs[Long]("n_email") == 2)
    assert(r.getAs[Long]("n_phone") == 1)
    assert(r.getAs[Long]("n_ip") == 1)
    assert(r.getAs[String]("redacted") ==
      "mail <EMAIL> or <EMAIL> call <PHONE> from <IP> end")
  }

  test("clean text passes through untouched with zero counts") {
    val r = run("no contact details here, just words and 1234 numbers")
    assert(r.getAs[Long]("n_email") == 0)
    assert(r.getAs[Long]("n_phone") == 0)
    assert(r.getAs[Long]("n_ip") == 0)
    assert(r.getAs[String]("redacted") ==
      "no contact details here, just words and 1234 numbers")
  }

  test("repeated hits of one rule are all counted and all redacted") {
    val r = run("1.2.3.4 then 5.6.7.8 then 9.10.11.12")
    assert(r.getAs[Long]("n_ip") == 3)
    assert(r.getAs[String]("redacted") == "<IP> then <IP> then <IP>")
  }

  test("id columns are carried through unchanged") {
    val df = Seq((7L, "grp", "x@y.io")).toDF("id", "g", "txt")
    val r = Privacy.detectRedact(df, "txt", Seq("id", "g")).collect().head
    assert(r.getAs[Long]("id") == 7L && r.getAs[String]("g") == "grp")
    assert(r.getAs[String]("redacted") == "<EMAIL>")
  }
}
