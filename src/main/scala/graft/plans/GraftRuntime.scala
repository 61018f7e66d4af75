package graft.plans

import org.apache.spark.sql.SparkSession

/** Session bootstrap for host applications that did NOT build their session
  * with [[GraftExtensions]] (`withExtensions` / `spark.sql.extensions`):
  * registers the planner strategy and optimizer rule through the public
  * `spark.experimental` API, which the planner consults on every query.
  * Idempotent; [[graft.SparkEntry]] calls it on entry so the engine works
  * on any session handed to it.
  */
object GraftRuntime {
  def ensure(spark: SparkSession): Unit = synchronized {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(TopKStrategy))
      exp.extraStrategies = exp.extraStrategies :+ TopKStrategy
    if (!exp.extraOptimizations.contains(TopKRewriteRule))
      exp.extraOptimizations = exp.extraOptimizations :+ TopKRewriteRule
    // events.parquet carries TIMESTAMP(NANOS); without this the scan
    // errors at load time on a session that didn't preset it
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  }
}
