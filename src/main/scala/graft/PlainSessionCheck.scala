package graft
import org.apache.spark.sql.SparkSession
/** Simulates the driver: a session built WITHOUT GraftExtensions. */
object PlainSessionCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("plain-driver-session")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("entry rows: " + SparkEntry.entry(spark).count())
    println("q45 rows: " + SparkEntry.queries("q45_ann_brute")(spark, "/root/testdata/sf0.001").count())
    println("q54 rows: " + SparkEntry.queries("q54_ann_ivf_topk")(spark, "/root/testdata/sf0.001").count())
    println("q10 rows: " + SparkEntry.queries("q10_keep_first")(spark, "/root/testdata/sf0.001").count())
    println("q60 rows: " + SparkEntry.queries("q60_events_hourly")(spark, "/root/testdata/sf0.001").count())
    spark.stop()
  }
}
