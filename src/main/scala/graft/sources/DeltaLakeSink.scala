package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Native Delta Lake WRITE support — append-only commits through the
  * optimistic-concurrency protocol (delta.io PROTOCOL.md "Transaction
  * Log Entries" + "Concurrency Control"; the reference's write support
  * likewise goes through the kernel's commit API,
  * src/Storages/ObjectStorage/DataLakes/DeltaLake/). Shape:
  *
  *  1. data files write FIRST, into the table directory under fresh
  *     UUID-prefixed names (a failed transaction leaves only orphans a
  *     VACUUM would collect — never a visible state change). Writes are
  *     ONE distributed parquet job; partitioned tables go through
  *     Spark's partitionBy so each file carries one partition tuple,
  *     recovered from the Hive-style directory names into the log's
  *     partitionValues (Delta reads them from the LOG, not the paths);
  *  2. the commit claims `_delta_log/%020d.json` with
  *     create(overwrite = false) — the atomic put-if-absent the
  *     protocol requires (object stores need their conditional-put
  *     here). On collision, the loser re-reads the log delta: a pure
  *     blind APPEND conflicts with nothing, so it bumps the version
  *     and retries — unless a concurrent metaData/protocol action
  *     appeared, which is a real conflict and LOUD;
  *  3. creating the table (no `_delta_log`) writes protocol
  *     (minReader 1 / minWriter 2) + metaData (schemaString is the
  *     Spark StructType JSON Delta itself uses) + the adds, all in
  *     commit 0.
  *
  * Loud gates: appends to tables needing minWriterVersion > 2 or any
  * writerFeatures refuse (invariants/constraints/DVs could be
  * violated silently); schema mismatches by name/type refuse;
  * partition-column mismatches refuse.
  */
object DeltaLakeSink {

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Test-only failpoint, invoked once just before the first commit
    * claim — crash/race specs inject a competing commit here (the same
    * hook pattern as DurableRewrite.failpoint). */
  private[graft] var commitFailpoint: () => Unit = () => ()

  /** Writer-protocol gate (PROTOCOL.md "Table Features" + the legacy
    * writer-version table). Instead of the blanket minWriterVersion > 2
    * refusal, each feature the table carries — explicitly in
    * writerFeatures (minWriter 7) or implicitly through a legacy
    * version — checks whether THIS operation can violate it:
    *
    *   appendOnly        blocks deletes/updates when delta.appendOnly
    *   invariants        blocks row-adding ops when the schema carries
    *                     delta.invariants metadata
    *   checkConstraints  blocks row-adding ops when delta.constraints.*
    *                     properties exist
    *   generatedColumns  blocks row-adding ops when the schema carries
    *                     delta.generationExpression
    *   identityColumns   blocks row-adding ops when the schema carries
    *                     delta.identity.* metadata
    *   changeDataFeed    blocks ALL data changes when
    *                     delta.enableChangeDataFeed (this writer cannot
    *                     emit CDC files)
    *   deletionVectors   no write-side obligation (appends do not touch
    *                     DVs; rewrites read through them and emit
    *                     DV-free files)
    *   columnMapping     the CALLER's concern — data files need
    *                     physical column names
    *
    * A feature outside this table, or a legacy minWriterVersion > 7,
    * refuses loudly: the obligation is unknown, so writing could be
    * silently wrong. `op` is one of append/delete/update/overwrite.
    * A CoW delete only REMOVES rows, so invariant/constraint/generated
    * features cannot break (surviving rows already satisfied them). */
  /** The writer features a LEGACY minWriterVersion implies
    * (PROTOCOL.md's version table) — shared by the gate and the
    * DV protocol-upgrade enumeration so they can never disagree.
    * Version 7 returns empty: the explicit writerFeatures list
    * governs. */
  private def legacyWriterFeatures(minWriter: Int): Set[String] =
    minWriter match {
      case w if w <= 1 => Set.empty[String]
      case 2 => Set("appendOnly", "invariants")
      case 3 => Set("appendOnly", "invariants", "checkConstraints")
      case 4 => Set("appendOnly", "invariants", "checkConstraints",
        "changeDataFeed", "generatedColumns")
      case 5 => Set("appendOnly", "invariants", "checkConstraints",
        "changeDataFeed", "generatedColumns", "columnMapping")
      case 6 => Set("appendOnly", "invariants", "checkConstraints",
        "changeDataFeed", "generatedColumns", "columnMapping",
        "identityColumns")
      case _ => Set.empty[String]
    }

  private[sources] def writerGate(state: DeltaLakeSource.LogState,
      what: String, op: String): Unit = {
    // typeWidening (round 15): its writer obligation is maintaining
    // delta.typeChanges metadata WHEN CHANGING a column's type — this
    // writer never changes types (schema drift is refused), and appends
    // at the table's current (widened) schema are spec-legal as-is.
    // rowTracking/domainMetadata (round 15): fresh row ids assign on
    // appends/overwrites (see the write lane), DV deletes re-add files
    // verbatim with their ids echoed, and live domains persist through
    // log replay + checkpoints — but a COPY-ON-WRITE rewrite MOVES rows
    // and would need materialized row-id columns, so those ops refuse
    // below.
    val implemented = Set("deletionVectors", "appendOnly", "invariants",
      "checkConstraints", "changeDataFeed", "generatedColumns",
      "identityColumns", "columnMapping", "typeWidening",
      "rowTracking", "domainMetadata", "v2Checkpoint")
    require(state.minWriter <= 7,
      s"deltaLake $what: minWriterVersion ${state.minWriter} is newer " +
        "than this writer understands — refusing rather than violating " +
        "obligations it cannot see")
    val effective: Set[String] =
      legacyWriterFeatures(state.minWriter) ++ state.writerFeatures
    val unknown = effective -- implemented
    require(unknown.isEmpty,
      s"deltaLake $what: the table needs writer features " +
        s"${unknown.toSeq.sorted.mkString(", ")} this writer does not " +
        "implement — refusing rather than violating them silently")
    val conf = state.meta.map(_.configuration).getOrElse(Map.empty)
    val schemaStr = state.meta.map(_.schemaString).getOrElse("")
    def enabled(k: String) = conf.get(k).exists(_.equalsIgnoreCase("true"))
    // "compact" neither adds nor removes rows LOGICALLY (dataChange
    // false) — the spec permits it even on appendOnly/CDF tables
    val addsRows = op == "append" || op == "update" || op == "overwrite"
    val removesRows = op != "append" && op != "compact"
    if (effective("rowTracking"))
      require(op == "append" || op == "overwrite" || op == "delete-dv",
        s"deltaLake $what: the table tracks row ids and this operation " +
          "rewrites files (moved rows would need MATERIALIZED row-id " +
          "columns this writer does not emit) — use the deletion-vector " +
          "DELETE lane or appends")
    if (effective("invariants") && addsRows)
      require(!schemaStr.contains("delta.invariants"),
        s"deltaLake $what: the schema declares column invariants this " +
          "writer cannot enforce — refusing")
    if (effective("checkConstraints") && addsRows)
      require(!conf.keysIterator.exists(_.startsWith("delta.constraints.")),
        s"deltaLake $what: the table declares CHECK constraints this " +
          "writer cannot enforce — refusing")
    if (effective("generatedColumns") && addsRows)
      require(!schemaStr.contains("delta.generationExpression"),
        s"deltaLake $what: the schema declares generated columns this " +
          "writer cannot compute — refusing")
    if (effective("identityColumns") && addsRows)
      require(!schemaStr.contains("delta.identity."),
        s"deltaLake $what: the schema declares identity columns this " +
          "writer cannot allocate — refusing")
    // CDC files are only REQUIRED for commits that change or remove
    // existing rows — CDF readers derive append-only commits from the
    // dataChange adds themselves (PROTOCOL.md "Change Data Files"), so
    // plain appends to a CDF table stay legal. Round 16: the
    // copy-on-write mutate lane AND the deletion-vector delete lane
    // both EMIT cdc actions + _change_data files, so delete/update/
    // delete-dv pass; overwrite still cannot capture per-row changes
    // (the removed set is the whole table — the protocol expects
    // per-row change files, and materializing them would rewrite
    // everything an overwrite exists to avoid) and refuses.
    if (effective("changeDataFeed") && removesRows &&
        op != "delete" && op != "update" && op != "delete-dv")
      require(!enabled("delta.enableChangeDataFeed"),
        s"deltaLake $what: the table enables change data feed and this " +
          "operation cannot emit CDC files — refusing")
    if (effective("appendOnly") && removesRows)
      require(!enabled("delta.appendOnly"),
        s"deltaLake $what: the table is delta.appendOnly — refusing to " +
          "remove rows")
  }

  /** Append `df` to the Delta table at `tablePath`, creating it (with
    * `partitionBy`) when absent. Returns the committed version. Every
    * `checkpointInterval` commits a single-part checkpoint parquet +
    * `_last_checkpoint` pointer is written (the reference's
    * delta.checkpointInterval default is 10; 0 disables). */
  def append(df: DataFrame, tablePath: String,
      partitionBy: Seq[String] = Seq.empty,
      maxRetries: Int = 20, checkpointInterval: Int = 10): Long =
    write(df, tablePath, partitionBy, maxRetries, checkpointInterval,
      replace = false)

  /** REPLACE the table's contents atomically: one commit carrying a
    * remove for every previously-active file plus the new adds. A
    * concurrent commit invalidates the captured remove set, so
    * overwrite NEVER blind-retries — a collision is a loud conflict. */
  def overwrite(df: DataFrame, tablePath: String,
      partitionBy: Seq[String] = Seq.empty,
      checkpointInterval: Int = 10): Long =
    write(df, tablePath, partitionBy, maxRetries = 1, checkpointInterval,
      replace = true)

  private def write(df: DataFrame, tablePath: String,
      partitionBy: Seq[String], maxRetries: Int,
      checkpointInterval: Int, replace: Boolean): Long = {
    val spark = df.sparkSession
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val logDir = new Path(root, "_delta_log")

    // ---- existing table state (checkpoint-aware log replay, shared
    // with the reader so checkpoint-seeded tables write correctly) ----
    val commitRe = "^(\\d{20})\\.json$".r
    def listVersions(): Seq[Long] =
      if (!fs.exists(logDir)) Seq.empty
      else fs.listStatus(logDir).map(_.getPath.getName)
        .collect { case commitRe(v) => v.toLong }.sorted.toSeq
    val versions0 = listVersions()
    val hasLog = fs.exists(logDir) && fs.listStatus(logDir).exists(st =>
      st.getPath.getName.matches("\\d{20}\\.json") ||
        st.getPath.getName.contains(".checkpoint."))
    val state: Option[DeltaLakeSource.LogState] =
      if (hasLog) Some(DeltaLakeSource.replayLog(spark, tablePath))
      else None
    val creating = state.isEmpty

    state.foreach { st =>
      writerGate(st, "write", if (replace) "overwrite" else "append")
      val existing = org.apache.spark.sql.types.DataType
        .fromJson(st.meta.getOrElse(throw new IllegalArgumentException(
          "deltaLake write: existing table has no metaData action"))
          .schemaString)
        .asInstanceOf[org.apache.spark.sql.types.StructType]
      val got = df.schema
      // compare STRUCTURE only: nested fields may carry metadata (e.g.
      // delta.columnMapping.*) and nullability the incoming frame
      // legitimately lacks
      def norm(dt: org.apache.spark.sql.types.DataType)
          : org.apache.spark.sql.types.DataType = dt match {
        case st: org.apache.spark.sql.types.StructType =>
          org.apache.spark.sql.types.StructType(st.fields.map(f =>
            org.apache.spark.sql.types.StructField(
              f.name.toLowerCase, norm(f.dataType))))
        case org.apache.spark.sql.types.ArrayType(et, _) =>
          org.apache.spark.sql.types.ArrayType(norm(et))
        case org.apache.spark.sql.types.MapType(k, v, _) =>
          org.apache.spark.sql.types.MapType(norm(k), norm(v))
        case other => other
      }
      val want = existing.fields.map(f => f.name.toLowerCase ->
        norm(f.dataType)).toMap
      val have = got.fields.map(f => f.name.toLowerCase ->
        norm(f.dataType)).toMap
      require(want == have,
        s"deltaLake write: schema mismatch — table has ${existing.sql}, " +
          s"append has ${got.sql}")
      val tablePartCols = st.meta.get.partitionColumns
      require(partitionBy.isEmpty ||
        partitionBy.map(_.toLowerCase) == tablePartCols.map(_.toLowerCase),
        s"deltaLake write: table partitions by [${tablePartCols
          .mkString(", ")}], append asked [${partitionBy.mkString(", ")}]")
    }
    val partCols =
      if (creating) partitionBy
      else state.get.meta.get.partitionColumns
    partCols.foreach(c => require(
      df.schema.fieldNames.exists(_.equalsIgnoreCase(c)),
      s"deltaLake write: partition column '$c' missing from the data"))

    // ---- stage the data files (one distributed write job); a
    // column-mapped table stores PHYSICAL column names in its parquet
    // files and keys partitionValues by them (round 14 — appends to
    // colmap tables; creation never enables mapping) ----
    val mappingMode = state.flatMap(_.meta)
      .map(_.configuration.getOrElse("delta.columnMapping.mode", "none"))
      .getOrElse("none")
    val (stagedDf, stagePartCols) =
      if (mappingMode == "none") (df, partCols)
      else {
        val tableSchema = org.apache.spark.sql.types.DataType
          .fromJson(state.get.meta.get.schemaString)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        (toPhysical(df, tableSchema, mappingMode),
          partCols.map(pc => DeltaLakeSource.physNameOf(
            tableSchema.fields.find(_.name.equalsIgnoreCase(pc)).get,
            mappingMode)))
      }
    val added = stageDataFiles(stagedDf, root, fs, stagePartCols)
    require(added.nonEmpty || !creating,
      "deltaLake write: refusing to create a table from zero files")

    // ---- commit with optimistic concurrency ----
    def metaLines(): Seq[String] = {
      val meta = mapper.createObjectNode()
      meta.put("id", java.util.UUID.randomUUID().toString)
      val fmt = mapper.createObjectNode()
      fmt.put("provider", "parquet")
      fmt.set[com.fasterxml.jackson.databind.JsonNode]("options",
        mapper.createObjectNode())
      meta.set[com.fasterxml.jackson.databind.JsonNode]("format", fmt)
      meta.put("schemaString", df.schema.json)
      val pcs = mapper.createArrayNode()
      partCols.foreach(pcs.add)
      meta.set[com.fasterxml.jackson.databind.JsonNode](
        "partitionColumns", pcs)
      meta.set[com.fasterxml.jackson.databind.JsonNode]("configuration",
        mapper.createObjectNode())
      meta.put("createdTime", System.currentTimeMillis())
      val protoLine = mapper.createObjectNode()
      val proto = mapper.createObjectNode()
      proto.put("minReaderVersion", 1)
      proto.put("minWriterVersion", 2)
      protoLine.set[com.fasterxml.jackson.databind.JsonNode](
        "protocol", proto)
      val metaLine = mapper.createObjectNode()
      metaLine.set[com.fasterxml.jackson.databind.JsonNode](
        "metaData", meta)
      Seq(mapper.writeValueAsString(protoLine),
        mapper.writeValueAsString(metaLine))
    }
    val removes =
      if (replace) state.map(_.active.map(_._1)).getOrElse(Seq.empty)
      else Seq.empty
    // row tracking (round 15): every add gets FRESH base row ids above
    // the table's high watermark (domain delta.rowTracking) and the
    // commit version as defaultRowCommitVersion; the commit also bumps
    // the watermark domain. The body therefore depends on the claimed
    // VERSION — built per attempt below.
    val rowTracking = state.exists(st =>
      (legacyWriterFeatures(st.minWriter) ++ st.writerFeatures)
        .contains("rowTracking"))
    val addedRows: Seq[Long] =
      if (!rowTracking) added.map(_ => 0L)
      else added.map { case (rel, _, _) =>
        val pin = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(new Path(root, rel),
            spark.sparkContext.hadoopConfiguration)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(pin)
        try r.getRecordCount finally r.close()
      }
    val watermark0: Long = state.flatMap(_.domains.get("delta.rowTracking"))
      .flatMap { cfg =>
        scala.util.Try(mapper.readTree(cfg)
          .get("rowIdHighWaterMark").asLong).toOption
      }.getOrElse(-1L)
    def bodyFor(version: Long): Seq[String] = {
      val addLines =
        if (!rowTracking)
          added.map { case (rel, size, pv) => addJson(rel, size, pv) }
        else {
          var wm = watermark0
          added.zip(addedRows).map { case ((rel, size, pv), rows) =>
            val base = wm + 1
            wm += rows
            addJson(rel, size, pv, baseRowId = Some(base),
              defaultRowCommitVersion = Some(version))
          }
        }
      val domainLines =
        if (!rowTracking) Seq.empty
        else {
          val dm = mapper.createObjectNode()
          dm.put("domain", "delta.rowTracking")
          dm.put("configuration",
            s"""{"rowIdHighWaterMark":${watermark0 + addedRows.sum}}""")
          dm.put("removed", false)
          val line = mapper.createObjectNode()
          line.set[com.fasterxml.jackson.databind.JsonNode](
            "domainMetadata", dm)
          Seq(mapper.writeValueAsString(line))
        }
      (if (creating) metaLines() else Seq.empty) ++
        removes.map(p => removeJson(p)) ++ addLines ++ domainLines
    }

    // the next version must clear BOTH the newest JSON commit and the
    // newest checkpoint: on a vacuumed log (checkpoint only, no JSON
    // commits) starting from the listing alone would claim a version
    // BELOW the checkpoint — a commit readers silently never replay
    var version = math.max(
      versions0.lastOption.getOrElse(-1L),
      state.map(_.version).getOrElse(-1L)) + 1
    var committed = -1L
    var attempts = 0
    var seen = versions0.toSet
    while (committed < 0) {
      attempts += 1
      require(attempts <= maxRetries,
        s"deltaLake write: gave up after $maxRetries commit collisions")
      if (attempts == 1) commitFailpoint()
      val target = new Path(logDir, f"$version%020d.json")
      if (!fs.exists(logDir)) fs.mkdirs(logDir)
      val claimed =
        try {
          // overwrite = false: the protocol's atomic put-if-absent
          val out = fs.create(target, false)
          try out.write((bodyFor(version).mkString("\n") + "\n")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8))
          finally out.close()
          true
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case e: java.io.IOException
              if Option(e.getMessage).exists(_.contains("exist")) => false
        }
      if (claimed) committed = version
      else {
        if (creating) throw new IllegalStateException(
          "deltaLake write: the table was created concurrently — rerun " +
            "the append against the now-existing table")
        if (replace) throw new IllegalStateException(
          "deltaLake write: a concurrent commit landed during the " +
            "overwrite — the captured remove set is stale, refusing")
        if (rowTracking) throw new IllegalStateException(
          "deltaLake write: a concurrent commit landed on a " +
            "row-tracking table — the captured rowIdHighWaterMark is " +
            "stale and blind-retrying would hand out overlapping row " +
            "ids; rerun the append against the new state")
        // blind appends never conflict logically — but a concurrent
        // metaData/protocol change is a REAL conflict
        val newer = listVersions().filterNot(seen)
        newer.foreach { v =>
          val in = fs.open(new Path(logDir, f"$v%020d.json"))
          val text = try new String(in.readAllBytes(),
            java.nio.charset.StandardCharsets.UTF_8) finally in.close()
          text.split("\n").map(_.trim).filter(_.nonEmpty).foreach { line =>
            val node = mapper.readTree(line)
            if (node.has("metaData") || node.has("protocol"))
              throw new IllegalStateException(
                s"deltaLake write: concurrent metadata/protocol change " +
                  s"at version $v — refusing the append")
          }
          seen += v
        }
        version = math.max(version + 1,
          seen.maxOption.map(_ + 1).getOrElse(version + 1))
      }
    }
    if (checkpointInterval > 0 &&
        (committed + 1) % checkpointInterval == 0)
      writeCheckpoint(spark, tablePath, committed)
    committed
  }

  /** Stage `df`'s rows as parquet files inside the table directory
    * under txn-unique flat names, returning one (relative path, size,
    * partitionValues) tuple per file. Partitioned data goes through
    * Spark's partitionBy; the Hive-style staging dirs are walked back
    * into LOG partitionValues (the Delta model keeps them in the log,
    * not the path). A failure leaves only orphan files a VACUUM would
    * collect — never a visible state change. */
  private def stageDataFiles(df: DataFrame, root: Path,
      fs: org.apache.hadoop.fs.FileSystem, partCols: Seq[String],
      subDir: String = "", prefix: String = "part")
      : Seq[(String, Long, Map[String, Option[String]])] = {
    val txn = java.util.UUID.randomUUID().toString
    val stage = new Path(root, s"__graft_delta_stage_$txn")
    val writer = df.write.mode("overwrite")
    (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
      .parquet(stage.toString)
    if (subDir.nonEmpty) fs.mkdirs(new Path(root, subDir))
    val adds = scala.collection.mutable.ArrayBuffer
      .empty[(String, Long, Map[String, Option[String]])]
    def walk(p: Path, parts: Map[String, Option[String]]): Unit =
      fs.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory && n.contains("=")) {
          val Array(k, v) = n.split("=", 2)
          val value =
            if (v == "__HIVE_DEFAULT_PARTITION__") None
            else Some(java.net.URLDecoder.decode(v, "UTF-8"))
          walk(st.getPath, parts + (k -> value))
        } else if (n.endsWith(".parquet") && !n.startsWith(".")) {
          val name = s"$prefix-$txn-${adds.length}.parquet"
          val rel = if (subDir.isEmpty) name else s"$subDir/$name"
          val dst = new Path(root, rel)
          if (!fs.rename(st.getPath, dst))
            throw new IllegalStateException(
              s"deltaLake write: staging rename to $dst failed")
          adds += ((rel, fs.getFileStatus(dst).getLen, parts))
        }
      }
    try {
      walk(stage, Map.empty)
    } finally fs.delete(stage, true)
    adds.toSeq
  }

  private def addJson(rel: String, size: Long,
      pv: Map[String, Option[String]],
      dv: Option[DeltaDeletionVectors.DvDescriptor] = None,
      dataChange: Boolean = true,
      numRecords: Option[Long] = None,
      baseRowId: Option[Long] = None,
      defaultRowCommitVersion: Option[Long] = None,
      rawStats: Option[String] = None): String = {
    val pvNode = mapper.createObjectNode()
    pv.foreach { case (k, v) =>
      v match {
        case Some(x) => pvNode.put(k, x)
        case None => pvNode.putNull(k)
      }
    }
    val add = mapper.createObjectNode()
    add.put("path", rel)
    add.set[com.fasterxml.jackson.databind.JsonNode]("partitionValues",
      pvNode)
    add.put("size", size)
    add.put("modificationTime", System.currentTimeMillis())
    add.put("dataChange", dataChange)
    dv.foreach { d =>
      val n = mapper.createObjectNode()
      n.put("storageType", d.storageType)
      n.put("pathOrInlineDv", d.pathOrInlineDv)
      d.offset.foreach(n.put("offset", _))
      n.put("sizeInBytes", d.sizeInBytes)
      n.put("cardinality", d.cardinality)
      add.set[com.fasterxml.jackson.databind.JsonNode]("deletionVector", n)
    }
    // PROTOCOL.md writer requirements for deletion vectors: an add that
    // carries a DV descriptor must include stats with the file's
    // physical numRecords and tightBounds = false (external readers —
    // delta-spark, delta-kernel — use numRecords for DV-masked counts).
    numRecords.foreach { nr =>
      add.put("stats", s"""{"numRecords":$nr,"tightBounds":false}""")
    }
    rawStats.foreach(add.put("stats", _)) // verbatim echo (restore)
    baseRowId.foreach(add.put("baseRowId", _))
    defaultRowCommitVersion.foreach(add.put("defaultRowCommitVersion", _))
    val line = mapper.createObjectNode()
    line.set[com.fasterxml.jackson.databind.JsonNode]("add", add)
    mapper.writeValueAsString(line)
  }

  /** A `cdc` action (PROTOCOL.md "Add CDC File"): change data files
    * carry dataChange = false — CDF-unaware readers must ignore them. */
  private def cdcJson(rel: String, size: Long,
      pv: Map[String, Option[String]]): String = {
    val pvNode = mapper.createObjectNode()
    pv.foreach { case (k, v) =>
      v match {
        case Some(x) => pvNode.put(k, x)
        case None => pvNode.putNull(k)
      }
    }
    val c = mapper.createObjectNode()
    c.put("path", rel)
    c.set[com.fasterxml.jackson.databind.JsonNode]("partitionValues",
      pvNode)
    c.put("size", size)
    c.put("dataChange", false)
    val line = mapper.createObjectNode()
    line.set[com.fasterxml.jackson.databind.JsonNode]("cdc", c)
    mapper.writeValueAsString(line)
  }

  private def removeJson(path: String,
      dataChange: Boolean = true): String = {
    val rm = mapper.createObjectNode()
    rm.put("path", path)
    rm.put("deletionTimestamp", System.currentTimeMillis())
    rm.put("dataChange", dataChange)
    val line = mapper.createObjectNode()
    line.set[com.fasterxml.jackson.databind.JsonNode]("remove", rm)
    mapper.writeValueAsString(line)
  }

  /** COMPACTION — the lakehouse spelling of OPTIMIZE TABLE FINAL: read
    * the current logical state (deletion vectors apply), rewrite it as
    * size-targeted files (~128 MiB from the live file statuses), and
    * commit remove(all old) + add(new) with dataChange = FALSE — the
    * table's rows do not change, so the commit is legal even on
    * delta.appendOnly tables (the spec permits dataChange-false
    * removes for compaction). DVs materialize away. Returns
    * (version, files before, files after); an empty or single-file
    * DV-free table is a no-op. */
  def compact(spark: org.apache.spark.sql.SparkSession,
      tablePath: String, checkpointInterval: Int = 10): (Long, Int, Int) = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val state = DeltaLakeSource.replayLog(spark, tablePath)
    writerGate(state, "optimize", "compact")
    val m = state.meta.getOrElse(throw new IllegalArgumentException(
      "deltaLake optimize: the log has no metaData action"))
    val mappingMode = m.configuration
      .getOrElse("delta.columnMapping.mode", "none")
    val hasDv = state.active.exists(_._2.dv.isDefined)
    if (state.active.isEmpty ||
        (state.active.length == 1 && !hasDv))
      return (state.version, state.active.length, state.active.length)
    val totalBytes = state.active.map { case (p, _) =>
      val abs = DeltaLakeSource.qualify(spark, tablePath, p)
      scala.util.Try(fs.getFileStatus(abs).getLen).getOrElse(0L)
    }.sum
    val target = math.max(1L,
      (totalBytes + (128L << 20) - 1) / (128L << 20)).toInt
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(m.schemaString)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val partCols = m.partitionColumns
    val df = DeltaLakeSource.read(spark, tablePath).repartition(target)
    val (stagedDf, stagePartCols) =
      if (mappingMode == "none") (df, partCols)
      else (toPhysical(df, schema, mappingMode),
        partCols.map(pc => DeltaLakeSource.physNameOf(
          schema.fields.find(_.name.equalsIgnoreCase(pc)).get,
          mappingMode)))
    val added = stageDataFiles(stagedDf, root, fs, stagePartCols)
    val body = state.active.map(a => removeJson(a._1,
        dataChange = false)) ++
      added.map { case (rel, size, pv) =>
        addJson(rel, size, pv, dataChange = false)
      }
    val version = state.version + 1
    commitFailpoint()
    val logDir = new Path(root, "_delta_log")
    val target2 = new Path(logDir, f"$version%020d.json")
    val claimed =
      try {
        val out = fs.create(target2, false)
        try out.write((body.mkString("\n") + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException
            if Option(e.getMessage).exists(_.contains("exist")) => false
      }
    if (!claimed) throw new IllegalStateException(
      "deltaLake optimize: a concurrent commit landed during the " +
        "compaction — the captured file set is stale, refusing")
    if (checkpointInterval > 0 && (version + 1) % checkpointInterval == 0)
      writeCheckpoint(spark, tablePath, version)
    (version, state.active.length, added.length)
  }

  /** Row-level DELETE through a copy-on-write rewrite (the protocol's
    * remove + add commit; the reference's row-level Delta mutations go
    * through the same kernel commit shape). Only files that HOLD
    * matching rows rewrite — untouched files keep their identity, so
    * a partition-pruned predicate touches one partition's files on a
    * 100 TB table. Returns (committed version, rows deleted); deleting
    * zero rows commits nothing and returns the current version. */
  def delete(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      predicate: org.apache.spark.sql.Column,
      checkpointInterval: Int = 10): (Long, Long) =
    mutate(spark, tablePath, predicate, None, checkpointInterval)

  /** LIGHTWEIGHT row-level DELETE — the Delta twin of the reference's
    * lightweight `DELETE FROM` (which masks rows via `_row_exists`
    * instead of rewriting parts, MutationsInterpreter's lightweight
    * path): deleted rows mask through DELETION VECTORS (PROTOCOL.md
    * "Deletion Vectors") and NO data file rewrites:
    *
    *  1. one distributed scan finds matched (file, parquet row index)
    *     pairs THROUGH any existing DV masks and builds one roaring
    *     bitmap per file executor-side (groupByKey on the file path —
    *     only compressed bitmaps reach the driver, loud-capped);
    *  2. existing DVs OR-merge driver-side (bitmap scale);
    *  3. ONE new DV file holds every affected file's bitmap at its own
    *     offset ("u" storage, Z85 uuid name);
    *  4. one commit re-adds each affected file at its SAME path with
    *     the new descriptor (remove + add, dataChange true), claimed
    *     put-if-absent — a collision is loud, never a lost update.
    *
    * Tables below protocol (3, 7, deletionVectors) UPGRADE in the same
    * commit, enumerating the legacy features their old versions implied
    * (the spec's table-features upgrade rule). Column-mapped tables
    * work as-is: nothing rewrites, the stored partitionValues and paths
    * echo verbatim. Returns (version, rows deleted); zero matches
    * commit nothing. */
  def deleteLightweight(spark: org.apache.spark.sql.SparkSession,
      tablePath: String, predicate: org.apache.spark.sql.Column,
      checkpointInterval: Int = 10): (Long, Long) = {
    import org.apache.spark.sql.functions.col
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val state = DeltaLakeSource.replayLog(spark, tablePath)
    // op "delete-dv": rows MASK in place (files re-add verbatim), they
    // never move — legal on row-tracking tables, unlike CoW deletes
    writerGate(state, "delete", "delete-dv")

    // ---- 1. matched (file, row index) → per-file bitmaps, built
    // DISTRIBUTED so only compressed blobs reach the driver ----
    val withPos = DeltaLakeSource.read(spark, tablePath,
      withFileColumn = true, withRowIndexColumn = true)
    import spark.implicits._
    val perFile: Array[(String, Array[Byte], Long)] = withPos
      .filter(predicate)
      .select(col("__delta_file"), col("__delta_row_index"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapGroups { (file, it) =>
        val bms = scala.collection.mutable.Map
          .empty[Int, org.roaringbitmap.RoaringBitmap]
        var card = 0L
        it.foreach { case (_, idx) =>
          bms.getOrElseUpdate((idx >>> 32).toInt,
            new org.roaringbitmap.RoaringBitmap).add(idx.toInt)
          card += 1L
        }
        (file, DeltaDeletionVectors.serializeBitmapMap(bms.toSeq), card)
      }.collect()
    if (perFile.isEmpty) return (state.version, 0L)
    val matchedRows = perFile.map(_._3).sum
    val totalBytes = perFile.map(_._2.length.toLong).sum
    require(totalBytes <= DeltaLakeSource.MaxDvBytes,
      s"deltaLake delete: new deletion vectors total $totalBytes bytes, " +
        s"above the ${DeltaLakeSource.MaxDvBytes} cap — use the " +
        "copy-on-write ALTER ... DELETE instead")

    // ---- 2. merge with existing DVs; map scan paths → log paths ----
    val byDecoded = state.active.map { case (p, a) =>
      DeltaLakeSource.qualify(spark, tablePath, p).toUri.getPath -> (p, a)
    }.toMap
    val conf = spark.sparkContext.hadoopConfiguration
    val merged: Seq[(String, Active2, Array[Byte], Long)] =
      perFile.toSeq.map { case (decoded, blob, card) =>
        val (logPath, a) = byDecoded.getOrElse(decoded,
          throw new IllegalStateException(
            s"deltaLake delete: scanned file $decoded is not in the log"))
        a.dv match {
          case None =>
            (logPath, Active2(a.pv, a.baseRowId,
              a.defaultRowCommitVersion), blob, card)
          case Some(old) =>
            val oldBlob = DeltaDeletionVectors.readData(conf, tablePath, old)
            val (m, c) = DeltaDeletionVectors.mergeBlobs(oldBlob, blob)
            (logPath, Active2(a.pv, a.baseRowId,
              a.defaultRowCommitVersion), m, c)
        }
      }

    // ---- 2b. validate the POST-merge table-wide DV total against the
    // read cap: this commit's merged blobs PLUS the DVs that stay on
    // unaffected active files. Checking only the fresh blobs (the r14
    // form) let repeated deletes push the table's total past MaxDvBytes,
    // after which the reader's broadcast-cap require failed EVERY read —
    // a successful write must never render the table unreadable. ----
    val affected = merged.map(_._1).toSet
    val untouchedDvBytes = state.active.iterator.collect {
      case (p, a) if !affected.contains(p) && a.dv.isDefined =>
        a.dv.get.sizeInBytes.toLong
    }.sum
    val postMergeTotal = merged.map(_._3.length.toLong).sum +
      untouchedDvBytes
    require(postMergeTotal <= DeltaLakeSource.MaxDvBytes,
      s"deltaLake delete: committing would put the table-wide deletion-" +
        s"vector total at $postMergeTotal bytes, above the " +
        s"${DeltaLakeSource.MaxDvBytes} read cap — run OPTIMIZE " +
        "(compaction applies and drops the DVs) or use the " +
        "copy-on-write ALTER ... DELETE instead")

    // ---- 3. one DV file for the whole commit ----
    val uuid = java.util.UUID.randomUUID()
    val dvPath = new Path(root, s"deletion_vector_$uuid.bin")
    val offsets = DeltaDeletionVectors.writeDvFile(fs, dvPath,
      merged.map(_._3))
    val encoded = DeltaDeletionVectors.z85EncodeUuid(uuid)

    // ---- 3b. CHANGE DATA FEED (round 16): PROTOCOL.md requires a
    // writer that masks rows via deletion vectors on a CDF table to
    // ALSO write the change data for the deleted rows — the matched
    // rows (visible pre-delete, existing DVs applied) stage as
    // _change_data/ files with _change_type = 'delete', named by cdc
    // actions. One extra scan of the matched predicate, delete-scale.
    val mMeta = state.meta.getOrElse(throw new IllegalArgumentException(
      "deltaLake delete: the log has no metaData action"))
    val cdfEnabled = mMeta.configuration
      .get("delta.enableChangeDataFeed")
      .exists(_.equalsIgnoreCase("true"))
    val cdcAdded: Seq[(String, Long, Map[String, Option[String]])] =
      if (!cdfEnabled) Seq.empty
      else {
        val mappingMode = mMeta.configuration
          .getOrElse("delta.columnMapping.mode", "none")
        val schema = org.apache.spark.sql.types.DataType
          .fromJson(mMeta.schemaString)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        val partCols = mMeta.partitionColumns
        val matchedDf = DeltaLakeSource.read(spark, tablePath)
          .filter(predicate <=> org.apache.spark.sql.functions.lit(true))
          .withColumn("_change_type",
            org.apache.spark.sql.functions.lit("delete"))
        val stagedCdc =
          if (mappingMode == "none") matchedDf
          else matchedDf.select(schema.fields.map(f =>
            col(f.name)
              .cast(DeltaLakeSource.physicalizeType(f.dataType,
                mappingMode))
              .as(DeltaLakeSource.physNameOf(f, mappingMode)))
            .toIndexedSeq :+ col("_change_type"): _*)
        val stagePartCols =
          if (mappingMode == "none") partCols
          else partCols.map(pc => DeltaLakeSource.physNameOf(
            schema.fields.find(_.name.equalsIgnoreCase(pc)).get,
            mappingMode))
        stageDataFiles(stagedCdc, root, fs, stagePartCols,
          subDir = "_change_data", prefix = "cdc")
      }

    // ---- 4. commit: protocol upgrade (when needed) + remove/add per
    // affected file at its original path ----
    val upgrade = upgradeForDvLine(state)
    val cdcLines = cdcAdded.map { case (rel, size, pv) =>
      cdcJson(rel, size, pv)
    }
    val body = upgrade.toSeq ++ cdcLines ++ merged.zip(offsets).flatMap {
      case ((logPath, a2, blob, card), off) =>
        val abs = DeltaLakeSource.qualify(spark, tablePath, logPath)
        val size = scala.util.Try(fs.getFileStatus(abs).getLen)
          .getOrElse(0L)
        // the file's PHYSICAL row count for the required DV stats —
        // footer-only read, affected files only (delete-scale)
        val physRows = {
          val pin = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(abs, conf)
          val r = org.apache.parquet.hadoop.ParquetFileReader.open(pin)
          try r.getRecordCount finally r.close()
        }
        Seq(removeJson(logPath),
          addJson(logPath, size, a2.pv,
            Some(DeltaDeletionVectors.DvDescriptor("u", encoded,
              Some(off), blob.length, card)),
            numRecords = Some(physRows),
            // row tracking: the file re-adds VERBATIM, so its ids echo
            baseRowId = a2.baseRowId,
            defaultRowCommitVersion = a2.defaultRowCommitVersion))
    }
    val version = state.version + 1
    commitFailpoint()
    val logDir = new Path(root, "_delta_log")
    val target = new Path(logDir, f"$version%020d.json")
    val claimed =
      try {
        val out = fs.create(target, false)
        try out.write((body.mkString("\n") + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException
            if Option(e.getMessage).exists(_.contains("exist")) => false
      }
    if (!claimed) throw new IllegalStateException(
      s"deltaLake delete: a concurrent commit claimed version $version " +
        "— the captured deletion vectors are stale, refusing rather " +
        "than losing the concurrent change")
    if (checkpointInterval > 0 && (version + 1) % checkpointInterval == 0)
      writeCheckpoint(spark, tablePath, version)
    (version, matchedRows)
  }

  /** Carrier for the original add's partitionValues (the lightweight
    * delete re-adds files verbatim — physical keys included). */
  private final case class Active2(pv: Map[String, Option[String]],
      baseRowId: Option[Long] = None,
      defaultRowCommitVersion: Option[Long] = None)

  /** Rename a logical-schema DataFrame to its PHYSICAL column names
    * for a column-mapped table (nested fields rename through the
    * positional struct cast — the write-side mirror of the reader's
    * physical → logical projection). */
  private def toPhysical(df: DataFrame,
      tableSchema: org.apache.spark.sql.types.StructType,
      mode: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    df.select(tableSchema.fields.map(f =>
      col(f.name)
        .cast(DeltaLakeSource.physicalizeType(f.dataType, mode))
        .as(DeltaLakeSource.physNameOf(f, mode))).toIndexedSeq: _*)
  }

  /** The protocol action adding `addReader`/`addWriter` features, or
    * None when the table's EFFECTIVE feature sets (explicit lists, or
    * the sets a legacy version implies) already cover them. Upgrading
    * from a legacy version enumerates the features that version
    * IMPLIED (PROTOCOL.md's upgrade rule) so other writers keep
    * honoring them; minReaderVersion only bumps to 3 when a reader
    * feature is actually added. */
  private def upgradeLine(state: DeltaLakeSource.LogState,
      addReader: Set[String], addWriter: Set[String]): Option[String] = {
    val effWriter: Set[String] =
      if (state.minWriter >= 7) state.writerFeatures
      else legacyWriterFeatures(state.minWriter)
    val effReader: Set[String] = state.minReader match {
      case r if r <= 1 => Set.empty
      case 2 => Set("columnMapping")
      case _ => state.readerFeatures
    }
    if (addWriter.subsetOf(effWriter) && addReader.subsetOf(effReader))
      return None
    val newMinReader = if (addReader.nonEmpty) 3 else state.minReader
    val proto = mapper.createObjectNode()
    proto.put("minReaderVersion", newMinReader)
    proto.put("minWriterVersion", 7)
    if (newMinReader >= 3) {
      val rf = mapper.createArrayNode()
      (effReader ++ addReader).toSeq.sorted.foreach(rf.add)
      proto.set[com.fasterxml.jackson.databind.JsonNode](
        "readerFeatures", rf)
    }
    val wf = mapper.createArrayNode()
    (effWriter ++ addWriter).toSeq.sorted.foreach(wf.add)
    proto.set[com.fasterxml.jackson.databind.JsonNode]("writerFeatures", wf)
    val line = mapper.createObjectNode()
    line.set[com.fasterxml.jackson.databind.JsonNode]("protocol", proto)
    Some(mapper.writeValueAsString(line))
  }

  /** The protocol action enabling deletionVectors (readers AND writers
    * must understand DVs), or None when the table already has it. */
  private def upgradeForDvLine(state: DeltaLakeSource.LogState)
      : Option[String] =
    upgradeLine(state, Set("deletionVectors"), Set("deletionVectors"))

  /** SET table properties — the ALTER TABLE ... SET TBLPROPERTIES
    * analog: one commit carrying the updated metaData action (the
    * existing configuration merged with `props`). Enabling a property
    * whose table feature the protocol lacks upgrades the protocol in
    * the SAME commit (the spec's rule — a reader/writer must see the
    * feature before acting on the property):
    * delta.enableChangeDataFeed → changeDataFeed (writer);
    * delta.checkpointPolicy=v2 → v2Checkpoint (reader + writer).
    * Returns the committed version; a collision is loud. */
  def setTableProperties(spark: org.apache.spark.sql.SparkSession,
      tablePath: String, props: Map[String, String]): Long = {
    require(props.nonEmpty, "deltaLake set-properties: no properties")
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val state = DeltaLakeSource.replayLog(spark, tablePath)
    // op "compact" = neither adds nor removes rows: the gate still
    // refuses unknown features, which is the obligation here
    writerGate(state, "set-properties", "compact")
    val m = state.meta.getOrElse(throw new IllegalArgumentException(
      "deltaLake set-properties: the log has no metaData action"))
    val needWriter = Set.newBuilder[String]
    val needReader = Set.newBuilder[String]
    props.foreach {
      case ("delta.enableChangeDataFeed", v)
          if v.equalsIgnoreCase("true") =>
        needWriter += "changeDataFeed"
      case ("delta.checkpointPolicy", v) if v.equalsIgnoreCase("v2") =>
        needReader += "v2Checkpoint"; needWriter += "v2Checkpoint"
      case _ =>
    }
    val upgrade = upgradeLine(state, needReader.result(),
      needWriter.result())
    val meta = mapper.createObjectNode()
    meta.put("id", if (m.id.nonEmpty) m.id
      else java.util.UUID.randomUUID().toString)
    val fmt = mapper.createObjectNode()
    fmt.put("provider", "parquet")
    fmt.set[com.fasterxml.jackson.databind.JsonNode]("options",
      mapper.createObjectNode())
    meta.set[com.fasterxml.jackson.databind.JsonNode]("format", fmt)
    meta.put("schemaString", m.schemaString)
    val pcs = mapper.createArrayNode()
    m.partitionColumns.foreach(pcs.add)
    meta.set[com.fasterxml.jackson.databind.JsonNode](
      "partitionColumns", pcs)
    val confNode = mapper.createObjectNode()
    (m.configuration ++ props).foreach { case (k, v) =>
      confNode.put(k, v)
    }
    meta.set[com.fasterxml.jackson.databind.JsonNode](
      "configuration", confNode)
    val metaLine = mapper.createObjectNode()
    metaLine.set[com.fasterxml.jackson.databind.JsonNode](
      "metaData", meta)
    val body = upgrade.toSeq :+ mapper.writeValueAsString(metaLine)
    val version = state.version + 1
    commitFailpoint()
    val target = new Path(new Path(root, "_delta_log"),
      f"$version%020d.json")
    val claimed =
      try {
        val out = fs.create(target, false)
        try out.write((body.mkString("\n") + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException
            if Option(e.getMessage).exists(_.contains("exist")) => false
      }
    if (!claimed) throw new IllegalStateException(
      s"deltaLake set-properties: a concurrent commit claimed version " +
        s"$version — rerun against the new state")
    version
  }

  /** Row-level UPDATE through the same copy-on-write rewrite: matched
    * files rewrite with each assignment applied WHERE the predicate
    * holds (cast back to the column's declared type); unmatched rows in
    * those files carry over verbatim. Partition ("key") columns refuse
    * to update — the reference's MutationsInterpreter rule, and the
    * rewrite depends on rows never changing partition. */
  def update(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      assignments: Seq[(String, org.apache.spark.sql.Column)],
      predicate: org.apache.spark.sql.Column,
      checkpointInterval: Int = 10): (Long, Long) = {
    require(assignments.nonEmpty, "deltaLake update: no assignments")
    mutate(spark, tablePath, predicate, Some(assignments),
      checkpointInterval)
  }

  private def mutate(spark: org.apache.spark.sql.SparkSession,
      tablePath: String, predicate: org.apache.spark.sql.Column,
      assignments: Option[Seq[(String, org.apache.spark.sql.Column)]],
      checkpointInterval: Int): (Long, Long) = {
    import org.apache.spark.sql.functions.{col, not, when}
    val what = if (assignments.isEmpty) "delete" else "update"
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val state = DeltaLakeSource.replayLog(spark, tablePath)
    val m = state.meta.getOrElse(throw new IllegalArgumentException(
      s"deltaLake $what: the log has no metaData action"))
    writerGate(state, what, what)
    val mappingMode = m.configuration
      .getOrElse("delta.columnMapping.mode", "none")
    val schema = org.apache.spark.sql.types.DataType
      .fromJson(m.schemaString)
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val partCols = m.partitionColumns
    assignments.foreach(_.foreach { case (c, _) =>
      require(!partCols.exists(_.equalsIgnoreCase(c)),
        s"Cannot UPDATE key column `$c` (it is a partition column)")
      require(schema.fieldNames.exists(_.equalsIgnoreCase(c)),
        s"deltaLake update: no column `$c` in the table schema")
    })

    // ---- 1. which files hold matching rows (distributed scan; only
    // per-file COUNTS reach the driver — metadata scale) ----
    val withFile = DeltaLakeSource.read(spark, tablePath,
      withFileColumn = true)
    val matchedCounts = withFile.filter(predicate)
      .groupBy(col("__delta_file")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    if (matchedCounts.isEmpty) return (state.version, 0L)
    val matchedRows = matchedCounts.values.sum
    val byDecoded = state.active.map { case (p, _) =>
      DeltaLakeSource.qualify(spark, tablePath, p).toUri.getPath -> p
    }.toMap
    val matchedLog = matchedCounts.keySet.map(k =>
      byDecoded.getOrElse(k, throw new IllegalStateException(
        s"deltaLake $what: scanned file $k is not in the log")))

    // ---- 2. rewrite ONLY the matched files (one distributed job over
    // exactly those files; existing deletion vectors apply during the
    // read, so the rewritten files carry no DV) ----
    val scoped = DeltaLakeSource.read(spark, tablePath,
      onlyPaths = Some(matchedLog))
    val rewritten = assignments match {
      // survivors = rows NOT exactly-true under the predicate: a plain
      // not(predicate) is NULL for NULL-valued rows, which would drop
      // them from the rewrite — silent data loss on rows the DELETE
      // never matched
      case None =>
        scoped.filter(not(predicate <=> org.apache.spark.sql.functions
          .lit(true)))
      case Some(asn) =>
        asn.foldLeft(scoped) { case (d, (c, e)) =>
          val declared = schema.fields
            .find(_.name.equalsIgnoreCase(c)).get
          d.withColumn(declared.name,
            when(predicate, e.cast(declared.dataType))
              .otherwise(col(declared.name)))
        }
    }
    // a column-mapped table's rewrite stages PHYSICAL names (the read
    // above produced logical ones) and keys partitionValues physically
    val (stagedDf, stagePartCols) =
      if (mappingMode == "none") (rewritten, partCols)
      else (toPhysical(rewritten, schema, mappingMode),
        partCols.map(pc => DeltaLakeSource.physNameOf(
          schema.fields.find(_.name.equalsIgnoreCase(pc)).get,
          mappingMode)))
    val added = stageDataFiles(stagedDf, root, fs, stagePartCols)

    // ---- 2b. CHANGE DATA FEED (round 16 — PROTOCOL.md "Change Data
    // Files"): when the table enables delta.enableChangeDataFeed, the
    // commit must capture the per-row changes as `_change_data/` files
    // with a `_change_type` column — DELETE emits the matched rows as
    // 'delete', UPDATE emits 'update_preimage' + 'update_postimage'.
    // Same staging lane as data files (partition values in the ACTION,
    // not the file), dataChange = false so CDF-unaware readers skip
    // them. ----
    val cdfEnabled = m.configuration.get("delta.enableChangeDataFeed")
      .exists(_.equalsIgnoreCase("true"))
    val cdcAdded: Seq[(String, Long, Map[String, Option[String]])] =
      if (!cdfEnabled) Seq.empty
      else {
        import org.apache.spark.sql.functions.lit
        val matchedDf = scoped.filter(
          predicate <=> lit(true))
        val changeDf = assignments match {
          case None =>
            matchedDf.withColumn("_change_type", lit("delete"))
          case Some(asn) =>
            val pre = matchedDf
              .withColumn("_change_type", lit("update_preimage"))
            val post = asn.foldLeft(matchedDf) { case (d, (c, e)) =>
              val declared = schema.fields
                .find(_.name.equalsIgnoreCase(c)).get
              d.withColumn(declared.name, e.cast(declared.dataType))
            }.withColumn("_change_type", lit("update_postimage"))
            pre.unionByName(post)
        }
        val stagedCdc =
          if (mappingMode == "none") changeDf
          else changeDf.select(schema.fields.map(f =>
            col(f.name)
              .cast(DeltaLakeSource.physicalizeType(f.dataType,
                mappingMode))
              .as(DeltaLakeSource.physNameOf(f, mappingMode)))
            .toIndexedSeq :+ col("_change_type"): _*)
        stageDataFiles(stagedCdc, root, fs, stagePartCols,
          subDir = "_change_data", prefix = "cdc")
      }

    // ---- 3. one remove+add(+cdc) commit; a collision means the
    // captured file set is stale — LOUD, never a silent lost update ----
    val body = matchedLog.toSeq.sorted.map(p => removeJson(p)) ++
      added.map { case (rel, size, pv) => addJson(rel, size, pv) } ++
      cdcAdded.map { case (rel, size, pv) => cdcJson(rel, size, pv) }
    val version = state.version + 1
    commitFailpoint()
    val logDir = new Path(root, "_delta_log")
    val target = new Path(logDir, f"$version%020d.json")
    val claimed =
      try {
        val out = fs.create(target, false)
        try out.write((body.mkString("\n") + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException
            if Option(e.getMessage).exists(_.contains("exist")) => false
      }
    if (!claimed) throw new IllegalStateException(
      s"deltaLake $what: a concurrent commit claimed version $version — " +
        "the captured file set is stale, refusing rather than losing " +
        "the concurrent change")
    if (checkpointInterval > 0 && (version + 1) % checkpointInterval == 0)
      writeCheckpoint(spark, tablePath, version)
    (version, matchedRows)
  }

  /** RESTORE — revert the table's CONTENT to `version` with one new
    * commit (the delta-spark RESTORE verb): files active at the target
    * but not now re-ADD (echoing their partitionValues, deletion
    * vectors, stats and row-tracking ids verbatim — nothing moves),
    * files active now but not at the target REMOVE. History is
    * preserved (restore is itself a commit; time travel to the
    * pre-restore state still works). Refuses loudly when a target
    * file or its DV no longer exists on disk (a vacuum already
    * collected it).
    *
    * CDF tables (round 17 — the r16 verdict's #7, dropping the r16
    * refusal): the restore commit CAPTURES its changes as
    * `_change_data/` files from the file-level diff the restore
    * already computes — the re-added files' visible rows (target-
    * version DVs applied) emit as 'insert', the removed files' visible
    * rows (current DVs applied) as 'delete'. This is the file-level
    * change set delta-spark itself serves for restore commits; a row
    * untouched by the restore but living in a rewritten file appears
    * as delete + insert, the documented shape. Returns
    * (committed version, files re-added, files removed). */
  def restore(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      version: Long, checkpointInterval: Int = 10): (Long, Int, Int) = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = DeltaLakeSource.replayLog(spark, tablePath)
    require(version <= cur.version,
      s"deltaLake restore: version $version is not in the past " +
        s"(current ${cur.version})")
    // restore both removes current rows and re-adds old ones
    writerGate(cur, "restore", "delete")
    writerGate(cur, "restore", "append")
    val conf = cur.meta.map(_.configuration).getOrElse(Map.empty)
    val cdfEnabled = conf.get("delta.enableChangeDataFeed")
      .exists(_.equalsIgnoreCase("true"))
    val target = DeltaLakeSource.replayLog(spark, tablePath,
      Some(version))
    val curPaths = cur.active.map(_._1).toSet
    val targetByPath = target.active.toMap
    val reAdds = target.active.filterNot { case (p, _) => curPaths(p) }
    val removes = cur.active.map(_._1)
      .filterNot(targetByPath.contains)
    if (reAdds.isEmpty && removes.isEmpty)
      return (cur.version, 0, 0)
    // every re-added file (and its DV) must still exist — a vacuumed
    // target is unrecoverable and must be LOUD, not a broken table
    reAdds.foreach { case (p, a) =>
      val abs = DeltaLakeSource.qualify(spark, tablePath, p)
      require(fs.exists(abs),
        s"deltaLake restore: data file $p of version $version no " +
          "longer exists (vacuumed?) — the version is unrecoverable")
      a.dv.filter(d => d.storageType == "u" || d.storageType == "p")
        .foreach { d =>
          val dvp = DeltaDeletionVectors.dvFilePath(tablePath, d)
          require(fs.exists(dvp),
            s"deltaLake restore: deletion vector of $p no longer " +
              "exists (vacuumed?) — the version is unrecoverable")
        }
    }
    // CDF capture from the file-level diff (re-adds → inserts at the
    // TARGET version's view, removes → deletes at the CURRENT view —
    // each side's DV masks apply during its read)
    val cdcAdded: Seq[(String, Long, Map[String, Option[String]])] =
      if (!cdfEnabled) Seq.empty
      else {
        import org.apache.spark.sql.functions.{col, lit}
        val m = cur.meta.get
        val schema = org.apache.spark.sql.types.DataType
          .fromJson(m.schemaString)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        val mappingMode = m.configuration
          .getOrElse("delta.columnMapping.mode", "none")
        val partCols = m.partitionColumns
        val sides =
          (if (reAdds.isEmpty) Nil
           else Seq(DeltaLakeSource.read(spark, tablePath,
             versionAsOf = Some(version),
             onlyPaths = Some(reAdds.map(_._1).toSet))
             .withColumn("_change_type", lit("insert")))) ++
          (if (removes.isEmpty) Nil
           else Seq(DeltaLakeSource.read(spark, tablePath,
             onlyPaths = Some(removes.toSet))
             .withColumn("_change_type", lit("delete"))))
        val changeDf = sides.reduce(_ unionByName _)
        val (stagedCdc, stagePartCols) =
          if (mappingMode == "none") (changeDf, partCols)
          else (changeDf.select(schema.fields.map(f =>
            col(f.name)
              .cast(DeltaLakeSource.physicalizeType(f.dataType,
                mappingMode))
              .as(DeltaLakeSource.physNameOf(f, mappingMode)))
            .toIndexedSeq :+ col("_change_type"): _*),
            partCols.map(pc => DeltaLakeSource.physNameOf(
              schema.fields.find(_.name.equalsIgnoreCase(pc)).get,
              mappingMode)))
        stageDataFiles(stagedCdc, root, fs, stagePartCols,
          subDir = "_change_data", prefix = "cdc")
      }
    val body = removes.sorted.map(p => removeJson(p)) ++
      reAdds.map { case (p, a) =>
        val abs = DeltaLakeSource.qualify(spark, tablePath, p)
        val size = scala.util.Try(fs.getFileStatus(abs).getLen)
          .getOrElse(0L)
        addJson(p, size, a.pv, a.dv,
          baseRowId = a.baseRowId,
          defaultRowCommitVersion = a.defaultRowCommitVersion,
          rawStats = a.stats) // the target add's stats echo verbatim
      } ++
      cdcAdded.map { case (rel, size, pv) => cdcJson(rel, size, pv) }
    val newVersion = cur.version + 1
    commitFailpoint()
    val targetPath = new Path(new Path(root, "_delta_log"),
      f"$newVersion%020d.json")
    val claimed =
      try {
        val out = fs.create(targetPath, false)
        try out.write((body.mkString("\n") + "\n")
          .getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
        true
      } catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException
            if Option(e.getMessage).exists(_.contains("exist")) => false
      }
    if (!claimed) throw new IllegalStateException(
      s"deltaLake restore: a concurrent commit claimed version " +
        s"$newVersion — the captured file sets are stale, refusing")
    if (checkpointInterval > 0 &&
        (newVersion + 1) % checkpointInterval == 0)
      writeCheckpoint(spark, tablePath, newVersion)
    (newVersion, reAdds.size, removes.size)
  }

  /** VACUUM — delete files under the table directory that the CURRENT
    * snapshot does not reference and whose REMOVAL predates the
    * retention cutoff (Delta's default retention is 7 days). The age
    * gate is the REMOVE ACTION's `deletionTimestamp` (round 17 — the
    * r16 ADVICE finding: an mtime gate deletes an old file the moment
    * a compaction removes it, breaking concurrent readers and time
    * travel WITHIN the retention window the protocol promises is
    * safe); a DV bin ages by the removal of the add that referenced
    * it, and files no commit ever named (crashed-writer staging
    * orphans, historical `_change_data` files) keep the modification-
    * time gate — removal time does not exist for them. `_delta_log` is
    * never touched. Time travel to a version needing a deleted file
    * becomes loud at scan time, the protocol's documented vacuum
    * trade. Returns (files deleted, bytes reclaimed). */
  def vacuum(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      retentionMs: Long = 7L * 24 * 3600 * 1000): (Int, Long) = {
    require(retentionMs >= 0, "deltaLake vacuum: negative retention")
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val state = DeltaLakeSource.replayLog(spark, tablePath)
    // referenced = the current snapshot's data files + their DV files,
    // compared on decoded path components (the reader's normalization)
    val referenced: Set[String] = state.active.flatMap { case (p, a) =>
      val dataPath =
        DeltaLakeSource.qualify(spark, tablePath, p).toUri.getPath
      val dvPath = a.dv.filter(d => d.storageType == "u" ||
        d.storageType == "p").map(d =>
        fs.makeQualified(DeltaDeletionVectors.dvFilePath(tablePath, d))
          .toUri.getPath)
      dataPath +: dvPath.toSeq
    }.toSet
    // remove-action timestamps from the whole JSON log (the log is
    // commit-count metadata; vacuum never deletes log files, so every
    // remove this writer or an external one committed is here): decoded
    // data path → LATEST deletionTimestamp (absent timestamps fall
    // back to the commit file's own mtime). DV bins map through the
    // add actions that referenced them — a bin strands exactly when
    // its referencing add is removed/replaced.
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val logDir = new Path(root, "_delta_log")
    val commitRe = "^(\\d{20})\\.json$".r
    val removeTs = scala.collection.mutable.Map.empty[String, Long]
    val dvOfData = scala.collection.mutable.Map.empty[String, String]
    fs.listStatus(logDir).filter(st =>
        commitRe.pattern.matcher(st.getPath.getName).matches())
      .sortBy(_.getPath.getName).foreach { st =>
        val in = fs.open(st.getPath)
        val text = try new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8) finally in.close()
        text.split("\n").map(_.trim).filter(_.nonEmpty).foreach { line =>
          val node = mapper.readTree(line)
          Option(node.get("remove")).foreach { r =>
            val p = DeltaLakeSource.qualify(spark, tablePath,
              r.get("path").asText).toUri.getPath
            val ts = Option(r.get("deletionTimestamp")).map(_.asLong)
              .getOrElse(st.getModificationTime)
            removeTs(p) = math.max(removeTs.getOrElse(p, 0L), ts)
          }
          Option(node.get("add")).foreach { a =>
            Option(a.get("deletionVector")).foreach { dvn =>
              val storage = Option(dvn.get("storageType")).map(_.asText)
              if (storage.contains("u") || storage.contains("p")) {
                val addPath = DeltaLakeSource.qualify(spark, tablePath,
                  a.get("path").asText).toUri.getPath
                scala.util.Try {
                  val dv = DeltaDeletionVectors.DvDescriptor(
                    dvn.get("storageType").asText,
                    dvn.get("pathOrInlineDv").asText,
                    Option(dvn.get("offset")).filterNot(_.isNull)
                      .map(_.asInt),
                    dvn.get("sizeInBytes").asInt,
                    dvn.get("cardinality").asLong)
                  fs.makeQualified(DeltaDeletionVectors
                    .dvFilePath(tablePath, dv)).toUri.getPath
                }.foreach(dvPath => dvOfData(dvPath) = addPath)
              }
            }
          }
        }
      }
    val cutoff = System.currentTimeMillis() - retentionMs
    // a candidate's effective removal time: its own remove action, or
    // (DV bins) the latest removal/replacement of the add that carried
    // it, else None (never committed — mtime gate)
    def removalTime(decoded: String): Option[Long] =
      removeTs.get(decoded).orElse(
        dvOfData.get(decoded).flatMap(removeTs.get))
    var deleted = 0
    var bytes = 0L
    // hidden (dot/underscore-prefixed) names are PROTECTED, the same
    // rule Delta's vacuum applies — with _change_data special-cased as
    // collectible and __graft staging dirs collectible as this
    // writer's own crash leftovers
    def collectibleDir(n: String): Boolean =
      n == "_change_data" || n.startsWith("__graft") ||
        (!n.startsWith("_") && !n.startsWith("."))
    def walk(p: Path): Unit = fs.listStatus(p).foreach { st =>
      val n = st.getPath.getName
      if (st.isDirectory) {
        if (n != "_delta_log" && collectibleDir(n)) {
          walk(st.getPath)
          // prune now-empty dirs (crashed staging dirs, emptied
          // _change_data) — best-effort
          if (fs.listStatus(st.getPath).isEmpty)
            scala.util.Try(fs.delete(st.getPath, false))
        }
      } else if (!n.startsWith(".") && !n.startsWith("_")) {
        val decoded = fs.makeQualified(st.getPath).toUri.getPath
        // age by the file's REMOVAL, not its creation: a file removed
        // a moment ago (e.g. by compact) survives the full retention
        // window even if it is years old
        val aged = removalTime(decoded) match {
          case Some(ts) => ts < cutoff
          case None => st.getModificationTime < cutoff
        }
        if (!referenced.contains(decoded) && aged) {
          val len = st.getLen
          if (fs.delete(st.getPath, false)) {
            deleted += 1; bytes += len
            // the checksum sidecar of a deleted file goes with it
            scala.util.Try(fs.delete(
              new Path(st.getPath.getParent, s".$n.crc"), false))
          }
        }
      }
    }
    walk(root)
    (deleted, bytes)
  }

  /** Write the single-part checkpoint for `version` (PROTOCOL.md
    * "Checkpoints"): the reconstructed snapshot — one metaData row, one
    * protocol row, one add per active file (with its deletionVector
    * when present; checkpoint adds carry dataChange = false) — as
    * `%020d.checkpoint.parquet`, then the `_last_checkpoint` pointer.
    * Sizes come from the live file statuses. Failure here is harmless:
    * the JSON log stays authoritative and a later write retries. */
  /** Max add actions per v2 sidecar file — var only so specs can force
    * the multi-sidecar layout on small fixtures. */
  private[graft] var SidecarMaxActions: Int = 100000

  /** Write a checkpoint at `version`. `policy` None consults the
    * table's `delta.checkpointPolicy` configuration (the protocol's
    * own switch): "classic" (default) writes the single-part
    * `%020d.checkpoint.parquet`; "v2" (PROTOCOL.md "V2 Spec
    * Checkpoints") writes a UUID-named manifest
    * (`%020d.checkpoint.<uuid>.parquet`) holding protocol + metaData +
    * a checkpointMetadata integrity record + `sidecar` actions, with
    * the add set deferred to `_delta_log/_sidecars/<uuid>.parquet`
    * files of at most [[SidecarMaxActions]] actions each — the layout
    * the round-14 reader already replays. */
  def writeCheckpoint(spark: org.apache.spark.sql.SparkSession,
      tablePath: String, version: Long,
      policy: Option[String] = None): Unit = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val st = DeltaLakeSource.replayLog(spark, tablePath, Some(version))
    val m = st.meta.getOrElse(throw new IllegalArgumentException(
      "deltaLake checkpoint: the log has no metaData action"))
    val askedPolicy = policy
      .orElse(m.configuration.get("delta.checkpointPolicy"))
      .getOrElse("classic")
    require(askedPolicy == "classic" || askedPolicy == "v2",
      s"deltaLake checkpoint: unknown checkpointPolicy '$askedPolicy'")
    // v2 checkpoints are gated on the v2Checkpoint READER feature
    // (PROTOCOL.md "V2 Spec Checkpoints"): a classic-only reader will
    // not recognize the UUID-named file, and after the pre-checkpoint
    // JSON commits are vacuumed it would be STRANDED — so writing one
    // without the feature declared is refused loudly (r15 ADVICE).
    val hasV2Feature = st.minReader >= 3 &&
      st.readerFeatures("v2Checkpoint")
    require(askedPolicy != "v2" || hasV2Feature,
      "deltaLake checkpoint: checkpointPolicy v2 needs the " +
        "v2Checkpoint reader feature in the protocol — set it (e.g. " +
        "setTableProperties delta.checkpointPolicy=v2 upgrades the " +
        "protocol) before writing v2 checkpoints")
    val resolvedPolicy = askedPolicy
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dvSchema = StructType(Seq(
      StructField("storageType", StringType),
      StructField("pathOrInlineDv", StringType),
      StructField("offset", IntegerType),
      StructField("sizeInBytes", IntegerType),
      StructField("cardinality", LongType)))
    val schema = StructType(Seq(
      StructField("add", StructType(Seq(
        StructField("path", StringType),
        StructField("partitionValues",
          MapType(StringType, StringType, valueContainsNull = true)),
        StructField("size", LongType),
        StructField("modificationTime", LongType),
        StructField("dataChange", BooleanType),
        StructField("deletionVector", dvSchema),
        StructField("baseRowId", LongType),
        StructField("defaultRowCommitVersion", LongType),
        // round 16 (r15 ADVICE): the add's stats JSON — the protocol's
        // writer requirement for DV adds (numRecords/tightBounds) must
        // survive a checkpoint + JSON-log vacuum
        StructField("stats", StringType)))),
      StructField("metaData", StructType(Seq(
        StructField("id", StringType),
        StructField("format", StructType(Seq(
          StructField("provider", StringType)))),
        StructField("schemaString", StringType),
        StructField("partitionColumns", ArrayType(StringType)),
        StructField("configuration",
          MapType(StringType, StringType))))),
      StructField("protocol", StructType(Seq(
        StructField("minReaderVersion", IntegerType),
        StructField("minWriterVersion", IntegerType),
        StructField("readerFeatures", ArrayType(StringType)),
        StructField("writerFeatures", ArrayType(StringType))))),
      StructField("domainMetadata", StructType(Seq(
        StructField("domain", StringType),
        StructField("configuration", StringType),
        StructField("removed", BooleanType))))))
    val metaRow = Row(null,
      Row(m.id, Row("parquet"), m.schemaString, m.partitionColumns,
        m.configuration.map { case (k, v) => k -> v }),
      null, null)
    val protoRow = Row(null, null,
      Row(st.minReader, st.minWriter,
        if (st.readerFeatures.isEmpty) null else st.readerFeatures.toSeq,
        if (st.writerFeatures.isEmpty) null else st.writerFeatures.toSeq),
      null)
    // live domains (row-tracking watermark etc.) must survive a vacuum
    // — the protocol requires checkpoints to carry domain metadata
    val domainRows = st.domains.toSeq.map { case (d, cfg) =>
      Row(null, null, null, Row(d, cfg, false))
    }
    val addRows = st.active.map { case (p, a) =>
      val abs = new Path(root, p) // sink-written paths are relative
      val sz = scala.util.Try(fs.getFileStatus(abs)).map(_.getLen)
        .getOrElse(0L)
      val mt = scala.util.Try(fs.getFileStatus(abs))
        .map(_.getModificationTime).getOrElse(0L)
      Row(Row(p, a.pv.map { case (k, v) => k -> v.orNull },
        sz, mt, false,
        a.dv.map(d => Row(d.storageType, d.pathOrInlineDv,
          d.offset.map(Int.box).orNull, d.sizeInBytes,
          d.cardinality)).orNull,
        a.baseRowId.map(Long.box).orNull,
        a.defaultRowCommitVersion.map(Long.box).orNull,
        a.stats.orNull),
        null, null, null)
    }
    val logDir = new Path(root, "_delta_log")
    // one staged single-part parquet → renamed to `dst`
    def stageParquet(rows: Seq[Row], rowSchema: StructType, tag: String,
        dst: Path): Unit = {
      val tmp = new Path(root, s"__graft_ckpt_tmp_${version}_$tag")
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), rowSchema)
        .coalesce(1).write.mode("overwrite").parquet(tmp.toString)
      val part = fs.listStatus(tmp).map(_.getPath)
        .find(_.getName.startsWith("part-")).getOrElse(
          throw new IllegalStateException("deltaLake checkpoint: no part"))
      fs.delete(dst, false)
      if (!fs.rename(part, dst))
        throw new IllegalStateException(
          s"deltaLake checkpoint: rename to $dst failed")
      fs.delete(tmp, true)
    }
    // size-triggered v2 (round-16 directive #7): a classic checkpoint
    // builds every add Row on the driver and writes ONE file — at the
    // action cap that is a multi-GB single task. When the table's add
    // set exceeds the sidecar chunk size AND the protocol already
    // declares v2Checkpoint, default to the v2 lane (the protocol
    // permits it for any writer that supports the feature); without
    // the feature the classic form stays — the protocol upgrade is the
    // table owner's call, not a checkpoint side effect.
    val effectivePolicy =
      if (resolvedPolicy == "classic" && hasV2Feature &&
          addRows.size > SidecarMaxActions) {
        System.err.println(s"deltaLake checkpoint: ${addRows.size} adds " +
          s"exceed $SidecarMaxActions — switching to the v2 sidecar lane")
        "v2"
      } else resolvedPolicy
    val totalActions: Long =
      if (effectivePolicy == "classic") {
        stageParquet(Seq(protoRow, metaRow) ++ domainRows ++ addRows,
          schema, "c",
          new Path(logDir, f"$version%020d.checkpoint.parquet"))
        2L + domainRows.size + addRows.size
      } else {
        // ---- v2: sidecars hold the add set, the manifest the rest ----
        val sidecarDir = new Path(logDir, "_sidecars")
        fs.mkdirs(sidecarDir)
        val addOnlySchema = StructType(Seq(schema("add")))
        val sidecars = addRows.grouped(math.max(SidecarMaxActions, 1))
          .zipWithIndex.map { case (chunk, i) =>
            val name = s"${java.util.UUID.randomUUID()}.parquet"
            val dst = new Path(sidecarDir, name)
            stageParquet(chunk.map(r => Row(r.get(0))), addOnlySchema,
              s"sc$i", dst)
            (name, fs.getFileStatus(dst).getLen,
              fs.getFileStatus(dst).getModificationTime)
          }.toSeq
        val manifestSchema = StructType(Seq(
          schema("metaData"), schema("protocol"),
          StructField("checkpointMetadata", StructType(Seq(
            StructField("version", LongType)))),
          StructField("sidecar", StructType(Seq(
            StructField("path", StringType),
            StructField("sizeInBytes", LongType),
            StructField("modificationTime", LongType)))),
          schema("domainMetadata")))
        // metaRow/protoRow were built for (add, metaData, protocol) —
        // re-shape to the manifest's column order
        val mRows =
          Seq(Row(metaRow.get(1), null, null, null, null),
            Row(null, protoRow.get(2), null, null, null),
            Row(null, null, Row(version), null, null)) ++
            sidecars.map { case (n, sz, mt) =>
              Row(null, null, null, Row(n, sz, mt), null)
            } ++
            domainRows.map(dr => Row(null, null, null, null, dr.get(3)))
        stageParquet(mRows, manifestSchema, "m", new Path(logDir,
          f"$version%020d.checkpoint.${java.util.UUID.randomUUID()}.parquet"))
        mRows.size.toLong + addRows.size
      }
    val lc = mapper.createObjectNode()
    lc.put("version", version)
    lc.put("size", totalActions)
    val out = fs.create(new Path(new Path(root, "_delta_log"),
      "_last_checkpoint"), true)
    try out.write(mapper.writeValueAsString(lc)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }
}
