package graft.streaming

import java.util.UUID
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

object ProfStream {
  def t[A](tag: String)(body: => A): A = {
    val t0 = System.nanoTime(); val r = body
    println(f"PROF $tag%-22s ${(System.nanoTime()-t0)/1e9}%.3f"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local("prof-stream")
    val dir = "/root/testdata/sf0.1"
    val jitterMaxMs = 1800000L; val chunks = 12
    graft.sources.TestData.events(spark, dir).count()
    for (iter <- 1 to 2) {
      println(s"--- iter $iter")
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", "4")
      val ev = graft.sources.TestData.events(spark, dir)
      def jit(seed: org.apache.spark.sql.Column) =
        conv(substring(md5(seed), 1, 12), 16, 10).cast("long") % jitterMaxMs
      def side(copyId: Int, seedSuffix: String) = ev.select(
        col("event_id"), col("event_type"), col("ts").as("tstamp"),
        expr("ts_ns DIV 1000000").as("ms"), lit(copyId).as("copy"),
        (expr("ts_ns DIV 1000000")
          + jit(concat(col("event_id").cast("string"), lit(seedSuffix)))).as("arr"))
      val feed = side(0, "").unionByName(side(1, ":dup"))
      val maxLateMs = t("maxLateness") {
        graft.operators.Events.globalMaxLatenessMs(feed).head().getLong(0)
      }
      val delaySec = maxLateMs / 1000L + 1L
      val mm = feed.agg(min("arr").as("amin"), max("arr").as("amax"))
      val chunked = feed.crossJoin(broadcast(mm))
        .withColumn("chunk", least(lit(chunks - 1),
          ((col("arr") - col("amin")) * chunks
            / (col("amax") - col("amin") + 1)).cast("int")))
      val tmp = graft.Scratch.dir("prof-wmclose").toString + "/feed"
      t("chunk-write") {
        chunked.select("event_id", "event_type", "tstamp", "chunk")
          .repartition(chunks, col("chunk"))
          .write.partitionBy("chunk").parquet(tmp)
      }
      val t0m = (System.currentTimeMillis() / 60000L) * 60000L
      for (i <- 0 until chunks) {
        val d = new java.io.File(s"$tmp/chunk=$i")
        if (d.isDirectory) d.listFiles().foreach(f => { f.setLastModified(t0m + i * 1000L); () })
      }
      val schema = spark.read.parquet(tmp).schema
      val name = "stream_" + UUID.randomUUID().toString.replace("-", "")
      t("stream") {
        val q = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(tmp)
          .withWatermark("tstamp", s"$delaySec seconds")
          .dropDuplicatesWithinWatermark("event_id")
          .writeStream.outputMode("append").format("memory")
          .queryName(name).trigger(Trigger.AvailableNow()).start()
        try q.processAllAvailable() finally q.stop()
        val prog = q.recentProgress
        println(s"PROF triggers=${prog.length} batchDurations=${prog.map(_.durationMs.get("triggerExecution")).mkString(",")}")
      }
      t("result-agg") {
        spark.table(name).groupBy("event_type").agg(count(lit(1)).as("n_unique")).count()
      }
      spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    spark.stop()
  }
}
