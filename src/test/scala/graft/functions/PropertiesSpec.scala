package graft.functions

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.SparkSpec
import graft.functions.BankFunctions._

/** Property tests (SURVEY.md §5.4) — ScalaCheck generators drive Spark
  * expressions (so the codegen path is what's tested), sampled with a fixed
  * seed for reproducibility.
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](gen: Gen[A], seed: Long): A =
    gen.apply(Gen.Parameters.default, Seed(seed)).get

  test("classifier is total: any description maps to one of the 7 labels") {
    val labels = keywordLists.map(_._2).toSet + fallbackCategory
    val gen = Gen.listOfN(500,
      Gen.oneOf(Gen.alphaLowerStr, Gen.oneOf(keywordLists.flatMap(_._1))))
    for (seed <- 1L to 5L) {
      val out = sample(gen, seed).toDF("d")
        .select(categoryFromDescription(col("d"))).as[String].collect()
      assert(out.forall(labels.contains))
    }
  }

  test("age group is total and consistent with bucket edges") {
    val labels = ageGroups.map(_._3).toSet + ageGroupElse
    val ages = (-5 to 120).toList
    val out = ages.toDF("a").select(col("a"), ageGroup(col("a")).as("g"))
      .as[(Int, String)].collect().toMap
    assert(ages.forall(a => labels.contains(out(a))))
    assert(out(17) == "< 18" && out(18) != "< 18")
  }

  test("Date_Key round-trips (y, m, d, h) for arbitrary timestamps 1970..2100") {
    val gen = Gen.listOfN(300, Gen.chooseNum(0L, 4102444800L))
    for (seed <- 1L to 3L) {
      val df = sample(gen, seed).map(s => new Timestamp(s * 1000)).toDF("ts").select(
        col("ts"), dateKey(col("ts")).as("k"),
        (year(col("ts")) * 1000000 + month(col("ts")) * 10000
          + dayofmonth(col("ts")) * 100 + hour(col("ts"))).as("recomputed"))
      assert(df.filter(col("k") =!= col("recomputed")).count() == 0)
    }
  }

  test("money quantization: within one cent of the double, stable under re-quantization") {
    import graft.functions.OracleSafe.money
    val gen = Gen.listOfN(500, Gen.chooseNum(0.0, 1e12))
    for (seed <- 1L to 3L) {
      val df = sample(gen, seed).toDF("x").select(col("x"), money(col("x")).as("m"))
      assert(df.filter(abs(col("m").cast("double") - col("x")) > lit(0.01)).count() == 0)
      // Not exactly idempotent (floor of the nearest-double representation
      // can drop one cent) — but always within one cent, deterministically.
      val df2 = df.select(col("m"), money(col("m").cast("double")).as("m2"))
      assert(df2.filter(abs(col("m") - col("m2")) > lit(0.01)).count() == 0)
    }
  }

  test("intDiv equals Math.floorDiv over the full BIGINT range (|a| beyond 2^53)") {
    import graft.functions.OracleSafe.intDiv
    // edge cases where the old double-division (or a subtract-pmod
    // numerator) breaks: ulp loss above 2^53, underflow near Long.MinValue
    val edges = Seq(
      (Long.MinValue, 3L), (Long.MinValue, 1L), (Long.MinValue, Long.MaxValue),
      (Long.MaxValue, 7L), (Long.MaxValue, 1L),
      ((1L << 60) + 123L, 1000L), (-(1L << 60) - 123L, 1000L),
      ((1L << 53) + 1L, 2L), (-(1L << 53) - 1L, 2L))
    val gen = Gen.listOfN(300, Gen.zip(
      Gen.chooseNum(Long.MinValue, Long.MaxValue),
      Gen.chooseNum(1L, Long.MaxValue)))
    for (seed <- 1L to 3L) {
      val out = (edges ++ sample(gen, seed)).toDF("a", "b")
        .select(col("a"), col("b"), intDiv(col("a"), col("b")).as("q"))
        .as[(Long, Long, Long)].collect()
      out.foreach { case (a, b, q) =>
        assert(q == Math.floorDiv(a, b), s"intDiv($a, $b)")
      }
    }
  }

  test("day-of-week shift always lands in 2..8 and weekend iff 7/8") {
    val gen = Gen.listOfN(300, Gen.chooseNum(0L, 4102444800L))
    for (seed <- 1L to 3L) {
      val df = sample(gen, seed).map(s => new Timestamp(s * 1000)).toDF("ts")
        .select(dayOfWeekVn(col("ts")).as("d"))
        .withColumn("w", isWeekend(col("d")))
      assert(df.filter(col("d") < 2 || col("d") > 8).count() == 0)
      assert(df.filter(col("w") =!= col("d").isin(7, 8)).count() == 0)
    }
  }
}
