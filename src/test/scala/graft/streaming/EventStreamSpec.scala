package graft.streaming

import graft.SparkSpec

/** The streaming plan must produce EXACTLY the batch result — same windows,
  * same counts, same decimal sums (differential test, SURVEY.md §5.5).
  */
class EventStreamSpec extends SparkSpec {

  test("streaming tumbling-window agg equals the batch aggregation") {
    val streaming = EventStream.tumblingHourly(spark, sf)
    val batch = graft.SparkEntry.queries("q60_events_hourly")(spark, sf)
    assert(streaming.count() > 0)
    assert(streaming.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streaming).count() == 0)
  }

  test("flatMapGroupsWithState sessionization equals the batch window formulation") {
    val streaming = EventStream.sessionizeStateful(spark, sf)
      .select("user_id", "session_seq", "n_events", "start_ms", "end_ms")
    val batch = graft.operators.Events.sessionize(graft.sources.TestData.events(spark, sf))
      .select("user_id", "session_seq", "n_events", "start_ms", "end_ms")
    assert(streaming.count() > 0)
    assert(streaming.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streaming).count() == 0)
  }

  test("stream-static broadcast join equals the batch join") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val userDim = (0L to 14L).map(u => (u, if (u % 2 == 0) "even" else "odd"))
      .toDF("user_id", "cohort")
    val streaming = EventStream.enrichedTypeTotals(spark, sf, userDim)
    val batch = graft.sources.TestData.events(spark, sf)
      .join(userDim, Seq("user_id"))
      .groupBy("cohort", "event_type").agg(count(lit(1)).as("n"))
    assert(streaming.count() > 0)
    assert(streaming.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streaming).count() == 0)
  }

  test("stream-stream interval join equals the batch self-join") {
    import org.apache.spark.sql.functions._
    val streaming = EventStream.clickViewPairs(spark, sf)
    val ev = graft.sources.TestData.events(spark, sf)
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"))
    val v = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("vts"))
    val batch = c.join(v, Seq("user_id"))
      .filter(col("vts") >= col("cts") - expr("INTERVAL 10 MINUTES") && col("vts") <= col("cts"))
      .groupBy("user_id").agg(count(lit(1)).as("n_pairs"))
    assert(streaming.count() > 0)
    assert(streaming.exceptAll(batch).count() == 0)
    assert(batch.exceptAll(streaming).count() == 0)
  }

  test("stateful dedup-within-watermark collapses a doubled source to distinct ids") {
    // simulate at-least-once delivery: the same file arrives twice
    val dir = java.nio.file.Files.createTempDirectory("evdup")
    for (name <- Seq("a.parquet", "b.parquet"))
      java.nio.file.Files.copy(
        java.nio.file.Path.of(s"$sf/events.parquet"), dir.resolve(name))
    val distinctIds = spark.read.parquet(s"$sf/events.parquet").count()
    assert(EventStream.dedupedCount(spark, dir.toString) == distinctIds)
  }
}
