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
}
