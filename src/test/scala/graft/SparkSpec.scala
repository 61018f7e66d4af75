package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session; suites run in
  * a single forked JVM under sbt).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  val sf: String = "/root/testdata/sf0.001"
}

object SparkSpec {
  lazy val session: SparkSession =
    GraftSession.builder("graft-test", master = Some("local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      // fresh per-JVM warehouse: managed-table tests never collide with
      // leftovers from a previous run
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
}
