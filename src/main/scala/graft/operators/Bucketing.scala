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
    val target = new Path(catalog.defaultTablePath(ident))
    // An EXTERNAL table whose LOCATION happens to BE the default managed
    // path (adopting existing files) cannot be rewritten in place: DROP
    // preserves its files by design, but the managed write needs that
    // exact directory clear — deleting would destroy the (possibly
    // shared, possibly self-read) source. Refuse BEFORE dropping.
    if (catalog.tableExists(ident)) {
      val meta = catalog.getTableMetadata(ident)
      require(meta.tableType != org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL
          || new Path(meta.location) != target,
        s"writeBucketed: external table ${ident.quotedString} sits at the default " +
          s"managed location $target — rewriting would delete its (preserved-on-DROP) " +
          "files; copy it elsewhere or drop it explicitly first")
    }
    spark.sql(s"DROP TABLE IF EXISTS ${ident.quotedString}")
    // saveAsTable writes a MANAGED table at the catalog's default location
    // for this identifier; files there can survive a previous session that
    // left no catalog entry, and Overwrite then refuses with
    // LOCATION_ALREADY_EXISTS. Clear exactly THAT path — resolved by the
    // catalog (correct for db-qualified names and non-default current
    // databases), and never an external table's custom location: DROP
    // preserves external files by design, and deleting them could destroy
    // shared source data (or the very files `df` is about to re-read).
    val fs = target.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(target)) fs.delete(target, true)
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }
}
