package graft

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR (default sf0.1) and prints one JSON line
  * `{"metric":"total","value":N,"unit":"sec","queries":{...},"sf":...}`.
  *
  * Timing includes plan + execution per query (a `count()` action drives the
  * full pipeline). A warm-up pass primes the JVM/JIT and the parquet footer
  * cache so the measured numbers reflect steady-state throughput rather than
  * first-query JVM startup.
  *
  * Each query is run SPARK_GRAFT_BENCH_REPS times (default 3) and the
  * MEDIAN is reported: single runs of sub-second shapes swing 2–3× between
  * identical-code rounds (GC, page cache, micro-batch timers), which reads
  * as a regression when nothing changed — the median is the number a
  * round-over-round comparison can actually trust.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val spark = GraftSession.local("graft-bench")

    // Warm-up: JIT + codegen cache on the smallest SF.
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case _: Throwable => () }
    }

    // Warm the SHARED warehouse caches at the target SF and report the fill
    // as its own number: without this, whichever dashboard query runs first
    // (alphabetically q25/q27) silently pays the star-schema build for the
    // whole block, and its per-query trend reads as a regression when only
    // run ordering changed. Query times below measure query work on a warm
    // warehouse; `warehouse_fill_sec` is the one-time build.
    val tFill = System.nanoTime()
    val fillSec =
      try {
        val w = graft.operators.BankEtl.buildCached(spark, sfDir)
        Seq(w.dimDate, w.dimCustomer, w.dimAccount, w.dimMerchant,
          w.dimLocation, w.fact).foreach(_.count())
        (System.nanoTime() - tFill) / 1e9
      } catch { case _: Throwable => -1.0 }

    // A failed query must NOT masquerade as a (tiny, plausible) timing —
    // record failures in their own field so a regression that makes a
    // query throw fast can't read as a speedup.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val runs = Seq.fill(reps) {
        val t0 = System.nanoTime()
        val ok = try { fn(spark, sfDir).count(); true }
          catch { case _: Throwable => false }
        ((System.nanoTime() - t0) / 1e9, ok)
      }
      (name, runs.map(_._1).sorted.apply(reps / 2), runs.forall(_._2)) // median
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    // failed queries' (fast-throw) medians are excluded from the headline,
    // so the total itself can't improve when a query breaks
    val total = results.collect { case (_, v, true) => v }.sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","reps":$reps,""" +
      s""""warehouse_fill_sec":$fillSec,"failed":$failed,"queries":$qs,"sf":"$sfDir"}"""
    // Belt and braces: the line on stdout (bare — build.sbt sets
    // StdoutOutput for forked runs) AND a file copy, in case the caller's
    // stdout is decorated by a build tool.
    try java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_SELF.json"),
      (json + "\n").getBytes("UTF-8"))
    catch { case scala.util.control.NonFatal(_) => () }
    spark.stop()
    println(json)
  }
}
