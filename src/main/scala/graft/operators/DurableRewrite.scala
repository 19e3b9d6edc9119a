package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.Path

/** Durable, partition-pruned part rewrites — the shared engine behind
  * every mutating statement (ALTER UPDATE/DELETE, lightweight DELETE,
  * CLEAR COLUMN, MATERIALIZE TTL, OPTIMIZE … DEDUPLICATE, SYSTEM
  * REFRESH VIEW).
  *
  * Reference contract (src/Interpreters/MutationsInterpreter.h:44 +
  * MergeTreeData part lifecycle): a mutation REWRITES parts — never
  * edits in place — and only parts that contain rows matching the
  * mutation predicate are rewritten; the new part is durable on disk
  * before the old one is retired.
  *
  * The Spark rendering:
  *  1. PRUNE — when the table is partitioned and the statement has a
  *     predicate, enumerate the partitions holding matching rows (a
  *     partition-pruned scan + a distinct over partition values, driver
  *     state bounded by the partition count, never the row count).
  *     Untouched partitions' files are never read for the write, never
  *     deleted, never rewritten — at 100 TB an UPDATE hitting one day
  *     rewrites one day.
  *  2. STAGE — write the mutated rows of affected partitions to a
  *     `__mutating` sibling directory. The staged copy is durable on
  *     disk BEFORE any destructive step; a crash here loses nothing.
  *  3. SWAP — rename each staged partition directory into the table
  *     (old dir aside to a trash sibling, staged in, trash deleted
  *     last), and retire partitions whose rows all died (a DELETE that
  *     empties a partition must not resurrect it from leftover files).
  *     The mutated data is written exactly ONCE; the swap is
  *     O(affected partitions) metadata operations. A crash mid-swap
  *     leaves the original-or-staged copy on disk — never neither (the
  *     old `localCheckpoint → overwrite` pattern kept the only copy in
  *     session executor memory during the delete window).
  *  4. Clean the stage only after the swap commits.
  */
object DurableRewrite {

  /** Rewrite scale of the last mutation per table — io-note + test
    * observability (the reference's system.mutations parts_to_do). */
  final case class Result(rewrittenPartitions: Int, untouchedPartitions: Int)
  val stats = new java.util.concurrent.ConcurrentHashMap[String, Result]()

  /** Test-only failpoint: invoked once the staged copy is durable,
    * immediately before the destructive swap begins. */
  @volatile private[graft] var failpoint: String => Unit = _ => ()

  /** Above this many affected partitions the predicate literal list
    * stops being a sane plan node — fall back to a full rewrite. */
  private val MaxEnumeratedPartitions = 10000

  /** Relative paths of the leaf partition directories `depth` levels
    * under `base` (Hive `col=value` layout), skipping metadata files. */
  private def leafPartitionDirs(fs: org.apache.hadoop.fs.FileSystem,
      base: Path, depth: Int): Seq[String] = {
    def walk(p: Path, d: Int): Seq[String] =
      if (d == 0) Seq("")
      else fs.listStatus(p).toSeq
        .filter(st => st.isDirectory && !st.getPath.getName.startsWith("_") &&
          !st.getPath.getName.startsWith("."))
        .flatMap(st => walk(st.getPath, d - 1)
          .map(rest => if (rest.isEmpty) st.getPath.getName
            else s"${st.getPath.getName}/$rest"))
    if (!fs.exists(base)) Seq.empty else walk(base, depth)
  }

  /** The old-aside / staged-in / trash-last rename dance (same contract
    * as ScaleOps.swapIn): a failure mid-swap restores the old directory
    * and preserves the staged copy. */
  private def swapDirIn(fs: org.apache.hadoop.fs.FileSystem, root: Path,
      dst: Path, staged: Path): Unit = {
    val trash = new Path(root,
      s"_trash_mutating/${dst.getName}_${System.nanoTime()}")
    fs.mkdirs(trash.getParent)
    fs.mkdirs(dst.getParent)
    val hadOld = fs.exists(dst)
    if (hadOld && !fs.rename(dst, trash))
      throw new IllegalStateException(
        s"mutation swap: could not move old $dst aside; nothing changed " +
          s"(staged copy preserved at $staged)")
    try {
      if (!fs.rename(staged, dst))
        throw new IllegalStateException(
          s"mutation swap: rename of staged $staged to $dst failed")
    } catch {
      case e: Throwable =>
        if (hadOld) fs.rename(trash, dst)
        throw new IllegalStateException(
          s"mutation swap failed; old partition restored, staged copy " +
            s"preserved at $staged", e)
    }
    fs.delete(trash, true)
  }

  /** `a=1/b=x y` → `Some("a = '1', b = 'x y'")` (unescaped values,
    * quoted). None when any segment is the Hive default-partition
    * sentinel: a null partition value has no literal the ALTER
    * partition-spec grammar can carry, so callers SKIP the catalog call
    * for null-keyed partitions (the file-level swap already committed;
    * a later REFRESH/MSCK reconciles the catalog). Recording the
    * sentinel as a STRING literal would corrupt catalog metadata. */
  private def partitionSpec(rel: String): Option[String] = {
    val segs = rel.split("/").map(_.split("=", 2))
    if (segs.exists(_(1) ==
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .DEFAULT_PARTITION_NAME)) None
    else Some(segs.map { case Array(k, v) =>
      val unescaped = org.apache.spark.sql.catalyst.catalog
        .ExternalCatalogUtils.unescapePathName(v)
      s"$k = '${unescaped.replace("'", "''")}'"
    }.mkString(", "))
  }

  /** Rewrite `table`'s data as `mutated` (same schema). `affected` is
    * the statement's row predicate (rows the mutation CHANGES or
    * REMOVES): with a partitioned table it prunes the rewrite to
    * partitions containing matching rows. Returns the rewrite scale. */
  def rewrite(spark: SparkSession, table: String, mutated: DataFrame,
      affected: Option[Column]): Result = {
    val meta = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
    val partCols = meta.partitionColumnNames
    val loc = meta.location.getPath
    val fs = new Path(loc).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = new Path(loc + "__mutating")
    fs.delete(stage, true)

    // partition count from the CATALOG partition listing — O(partitions)
    // metastore ops, never O(files) (inputFiles enumerated every file).
    // Falls back to an FS directory walk (also O(partitions): only
    // directories are listed at partition depth) for tables whose
    // partitions were written outside the catalog.
    def partitionDirs(): Seq[String] =
      if (partCols.isEmpty) Seq(loc)
      else {
        val fromCatalog = scala.util.Try(
          spark.sessionState.catalog.listPartitionNames(
            org.apache.spark.sql.catalyst.TableIdentifier(table)))
          .getOrElse(Seq.empty)
        if (fromCatalog.nonEmpty) fromCatalog
        else leafPartitionDirs(fs, new Path(loc), partCols.size)
      }

    def stageWrite(df: DataFrame): DataFrame = {
      val w0 = df.write.mode("overwrite")
      (if (partCols.nonEmpty) w0.partitionBy(partCols: _*) else w0)
        .parquet(stage.toString)
      failpoint(table)
      // explicit schema: no inference, partition-dir values cast back to
      // the table's exact types, column order preserved
      spark.read.schema(mutated.schema).parquet(stage.toString)
    }

    def fullRewrite(): Result = {
      val staged = stageWrite(mutated)
      // static mode: the WHOLE table is replaced, including partitions
      // whose rows all died (dynamic mode would leave them standing).
      // Per-WRITE option, not a session-conf set/restore: concurrent
      // mutation legs (PARALLEL WITH) interleaving a global set/restore
      // could permanently flip a user-configured dynamic mode to static.
      staged.write.mode("overwrite")
        .option("partitionOverwriteMode", "static").insertInto(table)
      graft.sources.SystemTables.PartLogLedger
        .record("MutatePart", table, "all")
      Result(partitionDirs().size, 0)
    }

    val res =
      if (partCols.isEmpty || affected.isEmpty) fullRewrite()
      else {
        val total = partitionDirs().size
        val vals = spark.table(table).filter(affected.get)
          .select(partCols.map(col): _*).distinct()
          .limit(MaxEnumeratedPartitions + 1).collect().toSeq
        if (vals.isEmpty) Result(0, total) // no matching rows: no file touched
        else if (vals.size > MaxEnumeratedPartitions) fullRewrite()
        else {
          val cond: Column =
            if (partCols.size == 1) {
              val c = col(partCols.head)
              val (nulls, nonNulls) = vals.partition(_.isNullAt(0))
              val in =
                if (nonNulls.nonEmpty) c.isin(nonNulls.map(_.get(0)): _*)
                else lit(false)
              if (nulls.nonEmpty) in || c.isNull else in
            } else vals.map { r =>
              partCols.zipWithIndex.map { case (pc, i) =>
                if (r.isNullAt(i)) col(pc).isNull else col(pc) === lit(r.get(i))
              }.reduce(_ && _)
            }.reduce(_ || _)
          val w0 = mutated.filter(cond).write.mode("overwrite")
          w0.partitionBy(partCols: _*).parquet(stage.toString)
          failpoint(table)
          // SWAP, not a second write: each staged partition directory
          // renames into the table via the trash dance (old dir aside,
          // staged in, trash deleted last — a failure restores the old
          // dir). O(affected partitions) metadata ops; the mutated data
          // is written exactly ONCE. Partitions the mutation emptied
          // have no staged dir and are retired. Mutations never MOVE
          // rows across partitions: statements that would assign a
          // partition column are rejected at the statement layer (the
          // reference likewise forbids UPDATE of key columns), so the
          // staged dirs are always a subset of the affected set.
          val stagedDirs = leafPartitionDirs(fs, stage, partCols.size)
          def affectedDir(r: org.apache.spark.sql.Row): String =
            partCols.zipWithIndex.map { case (pc, i) =>
              org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
                .getPartitionPathString(pc,
                  if (r.isNullAt(i)) null else r.get(i).toString)
            }.mkString("/")
          stagedDirs.foreach { rel =>
            swapDirIn(fs, new Path(loc), new Path(loc, rel),
              new Path(stage, rel))
            graft.sources.SystemTables.PartLogLedger
              .record("MutatePart", table, rel)
            partitionSpec(rel).foreach(spec => scala.util.Try(spark.sql(
              s"ALTER TABLE $table ADD IF NOT EXISTS PARTITION ($spec)")))
          }
          vals.map(affectedDir).filterNot(stagedDirs.toSet).foreach { rel =>
            graft.sources.SystemTables.PartLogLedger
              .record("RemovePart", table, rel)
            fs.delete(new Path(loc, rel), true)
            partitionSpec(rel).foreach(spec => scala.util.Try(spark.sql(
              s"ALTER TABLE $table DROP PARTITION IF EXISTS ($spec)")))
          }
          spark.sql(s"REFRESH TABLE $table")
          Result(vals.size, total - vals.size)
        }
      }

    fs.delete(stage, true)
    stats.put(table, res)
    res
  }

  /** Durable whole-table REPLACE with a possibly different schema
    * (ALTER COLUMN rewrites, SYSTEM REFRESH VIEW re-materialization):
    * stage `df` next to the table's location, then drop + re-create
    * from the staged files. A crash between the two leaves the original
    * table or the durable staged copy — never neither. Partitioning and
    * the managed/external distinction are preserved (an external table
    * is re-created at its ORIGINAL location, not silently re-homed). */
  def replaceTable(spark: SparkSession, table: String, df: DataFrame): Unit = {
    val meta = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
    val partCols = meta.partitionColumnNames
    val external = meta.tableType ==
      org.apache.spark.sql.catalyst.catalog.CatalogTableType.EXTERNAL
    val loc = meta.location.getPath
    val fs = new Path(loc).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val stage = new Path(loc + "__altering")
    fs.delete(stage, true)
    val w0 = df.write.mode("overwrite")
    (if (partCols.nonEmpty) w0.partitionBy(partCols: _*) else w0)
      .parquet(stage.toString)
    failpoint(table)
    val staged = spark.read.schema(df.schema).parquet(stage.toString)
    spark.sql(s"DROP TABLE $table") // purges loc if managed; stage survives
    if (external) {
      fs.delete(new Path(loc), true)
      if (!fs.rename(stage, new Path(loc)))
        throw new IllegalStateException(
          s"table rewrite $table: rename of staged data to $loc failed; " +
            s"rewritten copy preserved at $stage")
      val ddl = staged.schema.toDDL
      val partClause =
        if (partCols.nonEmpty) s" PARTITIONED BY (${partCols.mkString(", ")})"
        else ""
      spark.sql(
        s"CREATE TABLE $table ($ddl) USING parquet$partClause LOCATION '$loc'")
      if (partCols.nonEmpty) spark.sql(s"MSCK REPAIR TABLE $table")
    } else {
      val w = staged.write.mode("overwrite")
      (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
        .format("parquet").saveAsTable(table)
      fs.delete(stage, true) // the new copy is durable in the warehouse
    }
  }
}
