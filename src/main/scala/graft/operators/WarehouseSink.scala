package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col

/** Warehouse persistence (SURVEY.md S4 — replaces the reference's
  * `to_sql(..., if_exists='append', fast_executemany=True)` bulk loads,
  * `etl_pipeline/etl.py:287-304,386`).
  *
  * Dimensions are single parquet datasets; the fact is PARTITIONED BY the
  * date key's year-month prefix so time-range dashboard queries prune
  * partitions at the file-listing level — at 100 TB that's the difference
  * between scanning a month and scanning the lake. The IDENTITY read-back
  * round-trip of the reference (etl.py:315-326) does not exist here: keys
  * were computed in the DAG before the write.
  */
object WarehouseSink {

  /** Knobs for the JDBC write-back path, mirroring what the reference's
    * `to_sql(..., if_exists='append', fast_executemany=True, chunksize)`
    * load depends on (`etl_pipeline/etl.py:287-304,386`):
    * `batchSize` is the executemany chunk, `isolationLevel` the per-writer
    * transaction level, and `numPartitions` caps write parallelism — each
    * Spark partition opens one connection, so an uncapped 100 TB fact would
    * otherwise open thousands of sessions against the warehouse.
    */
  final case class JdbcSinkConfig(
      url: String,
      batchSize: Int = 10000,
      isolationLevel: String = "READ_COMMITTED",
      numPartitions: Option[Int] = None,
      tablePrefix: String = "")

  private val isolationLevels = Set(
    "NONE", "READ_COMMITTED", "READ_UNCOMMITTED", "REPEATABLE_READ",
    "SERIALIZABLE")

  /** Star-schema load order: dimensions before the fact, so the fact's FK
    * references never dangle mid-load (schema.sql's FK constraints).
    */
  val loadOrder: Seq[String] = Seq(
    "Dim_Date", "Dim_Customer", "Dim_Account", "Dim_Merchant",
    "Dim_Location", "Fact_Spending")

  /** Pure option assembly for one table — unit-testable without a database
    * (the harness has none; see [[graft.sources.JdbcSource]]).
    */
  def jdbcOptions(cfg: JdbcSinkConfig, table: String): Map[String, String] = {
    require(cfg.batchSize > 0, s"batchSize must be positive: ${cfg.batchSize}")
    require(isolationLevels.contains(cfg.isolationLevel),
      s"unknown isolationLevel '${cfg.isolationLevel}' " +
        s"(one of ${isolationLevels.mkString(", ")})")
    Map(
      "url" -> cfg.url,
      "dbtable" -> (cfg.tablePrefix + table),
      "batchsize" -> cfg.batchSize.toString,
      "isolationLevel" -> cfg.isolationLevel) ++
      cfg.numPartitions.map(n => "numPartitions" -> n.toString)
  }

  /** JDBC write-back of the whole star schema (the reference's actual sink;
    * parquet [[write]] stays the primary path). Exercised end-to-end against
    * an embedded Derby database in JdbcRoundTripSpec — the writer is the
    * stock Spark JDBC relation, so deployments with a real warehouse get
    * the reference's load without the single-process `executemany`
    * bottleneck.
    */
  def writeJdbc(w: BankEtl.Warehouse, cfg: JdbcSinkConfig,
      mode: SaveMode = SaveMode.Append): Unit =
    loadOrder.foreach { name =>
      // connection-count capping is the numPartitions option's job: the
      // stock JDBC writer coalesces to it before opening connections
      w.tables(name).write.format("jdbc").mode(mode)
        .options(jdbcOptions(cfg, name)).save()
    }

  /** Small-file compaction: rewrite a parquet dataset into ~`targetBytes`
    * files — the OPTIMIZE-style maintenance a long-lived lake needs, since
    * streaming and incremental writers accumulate small files that poison
    * scan performance (per-file open/footer cost dominates the read).
    * File count is sized from the ACTUAL bytes on disk, then one shuffle
    * redistributes rows evenly across exactly that many writers. The
    * rewrite lands in a sibling directory, so a failure during the (long)
    * rewrite phase leaves the original untouched; the swap is then a
    * three-step rename dance — original aside to `<dir>_old`, rewrite in,
    * delete the old copy — so at EVERY instant a complete copy of the
    * data exists on disk (a crash between the renames leaves it
    * recoverable at `<dir>_old` rather than lost). The swap is still not
    * atomic — a reader racing the renames can glimpse a missing path; on
    * an object store or for stronger guarantees, front this with a table
    * format's atomic commit. Returns the new file count.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
      targetBytes: Long = 128L << 20): Long = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val oldAside = new org.apache.hadoop.fs.Path(dir + "_old")
    // Crash-window recovery: a prior run that died between the renames
    // left no data at `dir` but the complete original at `<dir>_old` —
    // restore it before sizing, so the advertised "recoverable" state
    // actually recovers on the next call instead of failing the listing.
    if (!fs.exists(path) && fs.exists(oldAside))
      require(fs.rename(oldAside, path),
        s"compact: crash recovery rename $oldAside -> $path failed")
    val bytes = fs.getContentSummary(path).getLength
    val nFiles = math.max(1L, (bytes + targetBytes - 1) / targetBytes)
    val tmp = new org.apache.hadoop.fs.Path(dir + "_compacting")
    spark.read.parquet(dir).repartition(nFiles.toInt)
      .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(oldAside)) fs.delete(oldAside, true) // debris from a prior crash
    require(fs.rename(path, oldAside), s"compact: rename $path -> $oldAside failed")
    require(fs.rename(tmp, path), s"compact: rename $tmp -> $path failed")
    fs.delete(oldAside, true)
    nFiles
  }

  def write(w: BankEtl.Warehouse, outDir: String): Unit = {
    def dim(df: DataFrame, name: String): Unit =
      df.write.mode(SaveMode.Overwrite).parquet(s"$outDir/$name")
    dim(w.dimDate, "Dim_Date")
    dim(w.dimCustomer, "Dim_Customer")
    dim(w.dimAccount, "Dim_Account")
    dim(w.dimMerchant, "Dim_Merchant")
    dim(w.dimLocation, "Dim_Location")
    w.fact
      .withColumn("ym", (col("Date_Key") / 10000).cast("int")) // yyyyMM prefix
      // One shuffle so each writer task owns whole ym partitions: without
      // it every input split writes a sliver into every ym directory —
      // splits × months tiny files, the classic small-files failure at
      // scale. (AQE coalesces the shuffle when months are few.)
      .repartition(col("ym"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("ym")
      .parquet(s"$outDir/Fact_Spending")
  }
}
