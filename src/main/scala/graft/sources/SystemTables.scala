package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** System-table surface (reference: src/Storages/System/ —
  * StorageSystemTables.cpp, StorageSystemColumns.cpp,
  * StorageSystemFunctions.cpp). The Spark catalog is the source of truth;
  * these expose it as queryable frames with reference-shaped columns.
  * system.numbers/one are covered by the table functions
  * (`q_tf_numbers`). */
object SystemTables {

  /** system.tables: session-visible tables/views. */
  def tables(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listTables().collect()
      .map(t => (Option(t.database).getOrElse("default"), t.name,
        t.tableType, t.isTemporary))
      .toSeq.toDF("database", "name", "engine", "is_temporary")
  }

  /** system.columns: column inventory of a registered table. */
  def columns(spark: SparkSession, table: String): DataFrame = {
    import spark.implicits._
    spark.table(table).schema.fields.zipWithIndex
      .map { case (f, i) => (table, f.name, i + 1, f.dataType.simpleString) }
      .toSeq.toDF("table_name", "column_name", "position", "data_type")
  }

  /** system.functions: resolvable function names (builtin + registered). */
  def functions(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.catalog.listFunctions().collect()
      .map(f => (f.name, f.isTemporary)).toSeq
      .toDF("name", "is_temporary")
  }

  /** system.parts analog (src/Storages/System/StorageSystemParts.cpp):
    * one row per partition directory of a hive-partitioned parquet layout
    * (ScaleOps.writePartitioned — the PARTITION BY analog), with the
    * partition value, file count, byte size, and exact row count from the
    * parquet footers. The reference's part inventory maps to partition
    * directories; `active` is always true (no merge backlog in this
    * model). Footer-only reads: listing a 100 TB layout touches metadata,
    * not data. */
  def parts(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dirs = fs.listStatus(root).filter(_.isDirectory)
      .map(_.getPath).filter(_.getName.contains("="))
    dirs.map { d =>
      val files = fs.listStatus(d).filter(f => f.getPath.getName.endsWith(".parquet"))
      val rows = spark.read.parquet(d.toString).count()
      (d.getName, files.length.toLong, files.map(_.getLen).sum, rows, true)
    }.toSeq.sortBy(_._1)
      .toDF("partition", "file_count", "bytes_on_disk", "rows", "active")
  }

  /** system.settings analog (StorageSystemSettings.cpp): the session's
    * dialect-level knobs — every `SET k = v` lands under the graft.ch.*
    * conf namespace and is queryable here. */
  def settings(spark: SparkSession): DataFrame = {
    import spark.implicits._
    spark.conf.getAll.toSeq
      .filter(_._1.startsWith("graft.ch."))
      .map { case (k, v) => (k.stripPrefix("graft.ch."), v) }
      .sortBy(_._1)
      .toDF("name", "value")
  }

  /** system.query_log analog (src/Interpreters/QueryLog.h): the session's
    * dialect-statement history with literal-normalized text and wall
    * durations — the log-analysis surface normalizeQuery serves. */
  def queryLog(spark: SparkSession): DataFrame = {
    import spark.implicits._
    import scala.jdk.CollectionConverters._
    graft.sql.ClickHouseSql.queryLog.iterator.asScala.toSeq
      .map(e => (e.query, e.normalized, e.durationMs, e.eventTime))
      .toDF("query", "normalized_query", "query_duration_ms", "event_time")
  }

  /** system.dictionaries analog
    * (src/Storages/System/StorageSystemDictionaries.cpp): one row per
    * registered SQL dictionary with key type, attribute list, element
    * count — the loaded-dictionary introspection surface. */
  def dictionaries(spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.sql.Dictionaries.listDicts
      .toDF("name", "key_type", "attributes", "element_count")
  }

  /** system.data_skipping_indices (StorageSystemDataSkippingIndices.cpp):
    * every skip index created through the dialect's ALTER TABLE ADD INDEX,
    * with its table, type, and backing data path. */
  def dataSkippingIndices(spark: SparkSession): DataFrame = {
    import spark.implicits._
    graft.sql.ClickHouseSql.listSkipIndexes
      .toDF("table", "name", "type", "data_path")
  }
}
