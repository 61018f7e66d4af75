package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Bucketed tables for co-located joins (SURVEY.md §"Partitioning &
  * shuffle"): writing both sides of a recurring join bucketed by the join
  * key with the same bucket count lets Spark join them with NO shuffle
  * exchange — at 100 TB the dominant cost of a fact-to-fact join simply
  * disappears for every downstream query against the bucketed layout.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    val catalog = spark.sessionState.catalog
    val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
    // Resolve the REAL location from the catalog BEFORE dropping: a
    // hand-derived <warehouse.dir>/<name> is wrong for db-qualified names,
    // a non-default current database, or a custom LOCATION — and a
    // recursive delete of the wrong directory is an ops hazard.
    val existingLoc =
      if (catalog.tableExists(ident)) Some(new Path(catalog.getTableMetadata(ident).location))
      else None
    spark.sql(s"DROP TABLE IF EXISTS ${ident.quotedString}")
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    existingLoc match {
      case Some(loc) =>
        // DROP already removed a managed table's files; this clears the
        // (catalog-resolved) location an EXTERNAL table leaves behind, so
        // Overwrite doesn't hit LOCATION_ALREADY_EXISTS.
        val fs = loc.getFileSystem(hadoopConf)
        if (fs.exists(loc)) fs.delete(loc, true)
      case None =>
        // A previous SESSION's files can survive with no catalog entry —
        // but only the default warehouse layout can produce that, so the
        // blind fallback delete is restricted to unqualified names in the
        // default database.
        if (ident.database.getOrElse(catalog.getCurrentDatabase) == "default") {
          val loc = new Path(
            spark.conf.get("spark.sql.warehouse.dir"), ident.table.toLowerCase)
          val fs = loc.getFileSystem(hadoopConf)
          if (fs.exists(loc)) fs.delete(loc, true)
        }
    }
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }
}
