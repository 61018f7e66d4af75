package graft

/** Targeted per-query timing for optimization iteration — NOT the bench
  * artifact (that is [[Bench]], whose methodology the driver owns). Runs
  * only the named queries: one warm-up each at sf0.001, then `reps` timed
  * runs at `SPARK_GRAFT_SF_DIR` printing every rep, so a single query can
  * be profiled in seconds instead of the full-suite warm-up the bench
  * pays. Usage: `runMain graft.QTime q237_bloom_index_lookup [reps]`.
  */
object QTime {
  def main(args: Array[String]): Unit = {
    val reps = args.lastOption.flatMap(a => scala.util.Try(a.toInt).toOption)
      .getOrElse(3)
    val names = args.filterNot(a => scala.util.Try(a.toInt).isSuccess)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("graft-qtime")
    for (n <- names) {
      val fn = SparkEntry.queries(n)
      try fn(spark, "/root/testdata/sf0.001").count()
      catch { case t: Throwable => println(s"warmup $n FAILED: $t") }
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QTIME $n reps=$reps ${ts.map(t => f"$t%.3f").mkString(" ")} median=${ts.sorted.apply(reps / 2)}%.3f")
    }
    spark.stop()
  }
}
