package graft.sources

import org.apache.avro.Schema
import org.apache.avro.file.{DataFileStream, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/** Native Apache Iceberg APPEND — the write-side counterpart of
  * IcebergSource, following the PUBLIC spec's Hadoop-catalog commit
  * protocol (iceberg.apache.org/spec + the HadoopTableOperations
  * version-file convention):
  *
  *  1. the data files write FIRST (one distributed parquet job) under
  *     `data/` with transaction-unique names — a failed commit leaves
  *     only orphans;
  *  2. a NEW manifest Avro lists the added files (status 1), a NEW
  *     manifest list carries the previous snapshot's manifests forward
  *     plus the new one, stamped with the next sequence number (the
  *     reader inherits entry sequence numbers from the list — the rule
  *     that makes equality deletes apply only to OLDER data);
  *  3. `metadata/v(N+1).metadata.json` is claimed with
  *     create(overwrite = false) — the same atomic put-if-absent the
  *     Hadoop catalog uses; a collision means a concurrent committer
  *     won and is LOUD (appends re-run cheaply); `version-hint.text`
  *     updates best-effort after the claim.
  *
  * Scope: format-version 2; schema fixed at creation (by-name/type
  * match on append). Partitioned tables (round 15, extended round 16):
  * identity AND derived transforms (bucket[N]/truncate[W]/year/month/
  * day/hour, evaluated by IcebergTransforms per the spec) are
  * first-class across append/overwrite/compaction, the position-delete
  * lane, and copy-on-write mutations (rewritten survivors re-stage per
  * tuple; an UPDATE assigning any partition SOURCE column refuses —
  * rows would move partitions). Manifest entries record the spec's
  * typed `partition` struct (field-id 102, per-field partition ids)
  * so external engines resolve tuples by field id; `partition_json`
  * stays alongside as the internal convenience form.
  */
object IcebergSink {

  /** Test-only failpoint, fired just before the metadata claim. */
  private[graft] var commitFailpoint: () => Unit = () => ()

  /** One CURRENT data file during a CoW mutation — everything the
    * rewritten manifest must echo for the untouched survivors. */
  private final case class ExistingFile(path: String, rows: Long,
      tuple: Option[Map[String, Option[String]]], sizeBytes: Long,
      lower: Map[Int, Array[Byte]], upper: Map[Int, Array[Byte]])

  private val listSchema = new Schema.Parser().parse("""
    {"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string"},
      {"name":"manifest_length","type":"long"},
      {"name":"content","type":"int","default":0},
      {"name":"sequence_number","type":"long","default":0}]}""")

  /** The spec's key/value-record rendering of the bounds maps
    * (`lower_bounds` field 125 with k126/v127, `upper_bounds` 128 with
    * k129/v130 — binary values in Appendix D single-value form). */
  private def boundsFieldsJson: String = """
          {"name":"file_size_in_bytes","type":"long","field-id":104,
           "default":0},
          {"name":"lower_bounds","field-id":125,"type":["null",
            {"type":"array","logicalType":"map",
             "items":{"type":"record","name":"k126_v127","fields":[
               {"name":"key","type":"int","field-id":126},
               {"name":"value","type":"bytes","field-id":127}]}}],
           "default":null},
          {"name":"upper_bounds","field-id":128,"type":["null",
            {"type":"array","logicalType":"map",
             "items":{"type":"record","name":"k129_v130","fields":[
               {"name":"key","type":"int","field-id":129},
               {"name":"value","type":"bytes","field-id":130}]}}],
           "default":null},"""

  private val entrySchema = new Schema.Parser().parse(s"""
    {"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int"},
      {"name":"data_file","type":{"type":"record","name":"data_file",
        "fields":[
          {"name":"content","type":"int","default":0},
          {"name":"file_path","type":"string"},
          {"name":"file_format","type":"string"},
          {"name":"record_count","type":"long"},$boundsFieldsJson
          {"name":"partition_json","type":["null","string"],
           "default":null}]}}]}""")

  /** The manifest entry schema for a PARTITIONED table: the spec's
    * typed `partition` struct (data_file field-id 102; each struct
    * field carries its partition-spec field id, types from the
    * transform's result type) so spec-compliant external engines —
    * which resolve manifest columns by field id and require `partition`
    * for partitioned specs — read and prune graft-written tables.
    * `partition_json` stays alongside (internal convenience; the
    * reader prefers the struct). Unpartitioned tables keep the static
    * schema. */
  private def entrySchemaFor(
      fields: Seq[IcebergTransforms.IcePartField]): Schema = {
    if (fields.isEmpty) return entrySchema
    val structFields = fields.map { f =>
      s"""{"name":"${f.name}","field-id":${f.fieldId},""" +
        s""""type":["null",${IcebergTransforms.resultAvroType(f)}],""" +
        s""""default":null}"""
    }.mkString(",")
    new Schema.Parser().parse(s"""
      {"type":"record","name":"manifest_entry","fields":[
        {"name":"status","type":"int"},
        {"name":"data_file","type":{"type":"record","name":"data_file",
          "fields":[
            {"name":"content","type":"int","default":0},
            {"name":"file_path","type":"string"},
            {"name":"file_format","type":"string"},
            {"name":"record_count","type":"long"},$boundsFieldsJson
            {"name":"partition","field-id":102,"type":["null",
              {"type":"record","name":"r102","fields":[$structFields]}],
             "default":null},
            {"name":"partition_json","type":["null","string"],
             "default":null}]}}]}""")
  }

  /** Build one manifest entry under `eSchema`: the typed partition
    * struct (when the spec has fields and the tuple is known), the
    * partition_json convenience form, the file size (spec field 104 —
    * readers build their scan without re-stat-ing the file), and the
    * column bounds maps (fields 125/128 — min/max file skipping).
    * `sizeBytes` 0 = unknown; empty bounds maps write null. */
  private def mkEntry(eSchema: Schema, status: Int, content: Int,
      path: String, rows: Long,
      tuple: Option[Map[String, Option[String]]],
      fields: Seq[IcebergTransforms.IcePartField],
      sizeBytes: Long = 0L,
      lower: Map[Int, Array[Byte]] = Map.empty,
      upper: Map[Int, Array[Byte]] = Map.empty): GenericRecord = {
    val dSchema = eSchema.getField("data_file").schema()
    val d = new GenericData.Record(dSchema)
    d.put("content", content); d.put("file_path", path)
    d.put("file_format", "PARQUET"); d.put("record_count", rows)
    // always set: Avro GenericData does NOT auto-fill schema defaults
    // on write (r15 pitfall) — 0 means unknown, readers filter it out
    d.put("file_size_in_bytes", sizeBytes)
    def putBounds(field: String, m: Map[Int, Array[Byte]]): Unit =
      if (m.nonEmpty) {
        val itemSchema = dSchema.getField(field).schema()
          .getTypes.get(1).getElementType
        val arr = new java.util.ArrayList[GenericRecord](m.size)
        m.toSeq.sortBy(_._1).foreach { case (k, v) =>
          val kv = new GenericData.Record(itemSchema)
          kv.put("key", k)
          kv.put("value", java.nio.ByteBuffer.wrap(v))
          arr.add(kv)
        }
        d.put(field, arr)
      }
    putBounds("lower_bounds", lower)
    putBounds("upper_bounds", upper)
    tuple.foreach { t =>
      d.put("partition_json", tupleJson(t))
      if (fields.nonEmpty && dSchema.getField("partition") != null) {
        val pSchema = dSchema.getField("partition").schema().getTypes
          .get(1) // ["null", record]
        val p = new GenericData.Record(pSchema)
        fields.foreach { f =>
          p.put(f.name,
            IcebergTransforms.typedOfCanonical(t.getOrElse(f.name, None), f))
        }
        d.put("partition", p)
      }
    }
    val e = new GenericData.Record(eSchema)
    e.put("status", status); e.put("data_file", d); e
  }

  // ---- shared commit machinery (used by append/overwrite, the CoW
  // mutations and the lightweight position-delete writer — one copy,
  // so the three lanes can never drift) ----

  private def avroRecords(fs: org.apache.hadoop.fs.FileSystem,
      path: String): Seq[GenericRecord] = {
    val in = fs.open(new Path(path))
    val bytes = try in.readAllBytes() finally in.close()
    val rd = new DataFileStream[GenericRecord](
      new java.io.ByteArrayInputStream(bytes),
      new GenericDatumReader[GenericRecord]())
    try {
      val out = Seq.newBuilder[GenericRecord]
      while (rd.hasNext) out += rd.next()
      out.result()
    } finally rd.close()
  }

  private def optField(r: GenericRecord, name: String): Option[AnyRef] =
    if (r.getSchema.getField(name) == null) None else Option(r.get(name))

  private def writeAvro(fs: org.apache.hadoop.fs.FileSystem, path: Path,
      sch: Schema, rows: Seq[GenericRecord], what: String): Long = {
    val tmp = new Path(path.getParent, s"__tmp_${path.getName}")
    val out = fs.create(tmp, true)
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](sch))
    try { w.create(sch, out); rows.foreach(w.append) } finally w.close()
    if (!fs.rename(tmp, path)) throw new IllegalStateException(
      s"iceberg $what: rename to $path failed")
    fs.getFileStatus(path).getLen
  }

  /** Re-issue a manifest-list record under `listSchema` (carried
    * manifests keep path/length/content/sequence). */
  private def copyListRecord(r: GenericRecord): GenericRecord = {
    val c = new GenericData.Record(listSchema)
    c.put("manifest_path", r.get("manifest_path").toString)
    c.put("manifest_length", optField(r, "manifest_length").getOrElse(0L))
    c.put("content", optField(r, "content").getOrElse(0))
    c.put("sequence_number",
      optField(r, "sequence_number").getOrElse(0L))
    c
  }

  /** The v(N+1) metadata JSON for a new snapshot: the prior metadata
    * object is DEEP-COPIED whole and only the snapshot-cursor fields
    * are overridden, so top-level fields this writer does not model
    * (partition-specs, last-column-id, sort-orders, properties,
    * refs ...) carry through VERBATIM — real Iceberg engines validate
    * them, and the r14 string-template form silently dropped them on
    * every commit. None = creating (`freshSchemas` supplies the schema
    * array). */
  private def snapshotMetadataJson(
      meta: Option[com.fasterxml.jackson.databind.JsonNode],
      tablePath: String, newSeq: Long, snapshotId: Long,
      mlPath: String, freshSchemas: => String,
      freshPartitionSpecs: Option[String] = None): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val out: com.fasterxml.jackson.databind.node.ObjectNode = meta match {
      case Some(m) => m.deepCopy[com.fasterxml.jackson.databind.JsonNode]()
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      case None => mapper.createObjectNode()
    }
    out.put("format-version", 2)
    if (!out.has("table-uuid"))
      out.put("table-uuid", java.util.UUID.randomUUID().toString)
    out.put("location", tablePath)
    out.put("last-sequence-number", newSeq)
    out.put("current-snapshot-id", snapshotId)
    if (!out.has("current-schema-id")) out.put("current-schema-id", 0)
    if (!out.has("schemas")) {
      // v1-style metadata: lift the legacy singular "schema" into the
      // v2 array (kept in place too — passthrough, not rewrite)
      val arr =
        if (out.has("schema")) {
          val a = mapper.createArrayNode(); a.add(out.get("schema")); a
        } else mapper.readTree(freshSchemas)
      out.set[com.fasterxml.jackson.databind.JsonNode]("schemas", arr)
    }
    freshPartitionSpecs.foreach { spJson =>
      if (!out.has("partition-specs")) {
        out.set[com.fasterxml.jackson.databind.JsonNode](
          "partition-specs", mapper.readTree(spJson))
        out.put("default-spec-id", 0)
      }
    }
    val snaps = out.get("snapshots") match {
      case a: com.fasterxml.jackson.databind.node.ArrayNode => a
      case _ =>
        val a = mapper.createArrayNode()
        out.set[com.fasterxml.jackson.databind.JsonNode]("snapshots", a)
        a
    }
    val sn = mapper.createObjectNode()
    sn.put("snapshot-id", snapshotId)
    sn.put("timestamp-ms", System.currentTimeMillis())
    sn.put("sequence-number", newSeq)
    sn.put("manifest-list", mlPath)
    snaps.add(sn)
    mapper.writeValueAsString(out)
  }

  /** Claim `vN.metadata.json` with the Hadoop catalog's atomic
    * put-if-absent; a collision is LOUD. The version hint updates
    * best-effort after the claim. */
  private def claimVersion(fs: org.apache.hadoop.fs.FileSystem,
      metaDir: Path, newVersion: Int, json: String, what: String,
      collisionNote: String): Unit = {
    val target = new Path(metaDir, s"v$newVersion.metadata.json")
    try {
      val out = fs.create(target, false)
      try out.write(json.getBytes(
        java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    } catch {
      case e: java.io.IOException
          if e.isInstanceOf[org.apache.hadoop.fs.FileAlreadyExistsException]
            || Option(e.getMessage).exists(_.contains("exist")) =>
        throw new IllegalStateException(
          s"iceberg $what: metadata v$newVersion was claimed " +
            s"concurrently — $collisionNote")
    }
    scala.util.Try {
      val hint = fs.create(new Path(metaDir, "version-hint.text"), true)
      try hint.write(newVersion.toString.getBytes("UTF-8"))
      finally hint.close()
    }
  }

  private def sparkToIceberg(dt: org.apache.spark.sql.types.DataType)
      : String = dt match {
    case org.apache.spark.sql.types.BooleanType => "boolean"
    case org.apache.spark.sql.types.IntegerType => "int"
    case org.apache.spark.sql.types.LongType => "long"
    case org.apache.spark.sql.types.FloatType => "float"
    case org.apache.spark.sql.types.DoubleType => "double"
    case org.apache.spark.sql.types.DateType => "date"
    case org.apache.spark.sql.types.TimestampType => "timestamptz"
    case org.apache.spark.sql.types.TimestampNTZType => "timestamp"
    case org.apache.spark.sql.types.StringType => "string"
    case org.apache.spark.sql.types.BinaryType => "binary"
    case d: org.apache.spark.sql.types.DecimalType =>
      s"decimal(${d.precision},${d.scale})"
    case other => throw new IllegalArgumentException(
      s"iceberg write: unsupported column type $other")
  }

  /** Append `df`, creating the table when `metadata/` is absent.
    * `partitionBy` (creation only — appends DERIVE the spec from the
    * table) declares the partition spec: bare column names are
    * identity transforms; `bucket(N, col)` / `truncate(W, col)` /
    * `year(col)` / `month(col)` / `day(col)` / `hour(col)` declare
    * derived transforms (evaluated per the spec by IcebergTransforms).
    * Data files split one-tuple-per-file, the tuple lands in the
    * manifest entry (typed `partition` struct + partition_json) so
    * reads prune at the manifest level, and every SOURCE column stays
    * IN the data files. Returns the new snapshot id. */
  def append(df: DataFrame, tablePath: String,
      partitionBy: Seq[String] = Nil): Long =
    commit(df, tablePath, carryForward = true, partitionBy)

  /** REPLACE the table's contents: the new snapshot's manifest list
    * carries NOTHING forward — only the new manifest — so every prior
    * data (and delete) file drops from the current state while older
    * snapshots stay time-travelable. */
  def overwrite(df: DataFrame, tablePath: String,
      partitionBy: Seq[String] = Nil): Long =
    commit(df, tablePath, carryForward = false, partitionBy)

  /** COMPACTION — the lakehouse spelling of OPTIMIZE TABLE FINAL:
    * materialize the current state (position/equality deletes apply
    * during the read) into fresh data files and publish it as an
    * overwrite snapshot. Delete files drop from the current state, so
    * copy-on-write mutations work again afterwards; older snapshots
    * stay travelable. Returns the new snapshot id. */
  def compact(spark: org.apache.spark.sql.SparkSession,
      tablePath: String): Long = {
    // the staged data files read the OLD state before the metadata
    // claim swaps the snapshot — a self-read-then-overwrite is safe
    overwrite(IcebergSource.read(spark, tablePath), tablePath)
  }

  /** The current schema node of a metadata JSON (v2 `schemas` array,
    * or the legacy singular `schema`). */
  private def schemaNodeOf(meta: com.fasterxml.jackson.databind.JsonNode)
      : com.fasterxml.jackson.databind.JsonNode =
    Option(meta.get("schemas")).map { arr =>
      val cur = Option(meta.get("current-schema-id")).map(_.asInt)
        .getOrElse(0)
      (0 until arr.size).map(arr.get)
        .find(_.get("schema-id").asInt == cur).getOrElse(arr.get(0))
    }.getOrElse(meta.get("schema"))

  /** The table's default partition spec, parsed and resolved against
    * the current schema (identity + derived transforms; loud on
    * transforms outside the spec's family). Nil for unpartitioned. */
  private def specFields(meta: com.fasterxml.jackson.databind.JsonNode)
      : Seq[IcebergTransforms.IcePartField] =
    IcebergTransforms.specFieldsOf(meta, schemaNodeOf(meta))

  /** One staged-and-renamed data file: exact footer row count, byte
    * size (→ manifest file_size_in_bytes), the partition tuple, and
    * the serialized column bounds harvested from the footer's
    * statistics (→ lower_bounds/upper_bounds). */
  private[graft] final case class StagedFile(path: String, rows: Long,
      sizeBytes: Long, tuple: Map[String, Option[String]],
      lower: Map[Int, Array[Byte]], upper: Map[Int, Array[Byte]])

  /** Stamp `parquet.field.id` metadata (the table's Iceberg field ids)
    * onto every top-level column, so the staged parquet files carry
    * ids per the spec — external engines (and this source's
    * schema-evolution lane) resolve columns by id. Spark's parquet
    * writer emits the ids whenever the schema metadata carries them. */
  private def stampFieldIds(df: DataFrame,
      colIds: Map[String, Int]): DataFrame = {
    import org.apache.spark.sql.functions.col
    // default-on in Spark 4, but the write is only spec-compliant if
    // the ids actually land in the files — pin the conf explicitly
    df.sparkSession.conf.set("spark.sql.parquet.fieldId.write.enabled",
      "true")
    df.select(df.schema.fields.toIndexedSeq.map { f =>
      colIds.get(f.name.toLowerCase) match {
        case Some(id) => col(f.name).as(f.name,
          new org.apache.spark.sql.types.MetadataBuilder()
            .putLong("parquet.field.id", id.toLong).build())
        case None => col(f.name)
      }
    }: _*)
  }

  /** Stage `df` (Hive-style over COMPUTED transform columns when the
    * spec has fields, so every source column stays IN the files) and
    * rename the parts into `data/` under txn-unique names. Returns a
    * [[StagedFile]] per non-empty file — row count, size, and column
    * bounds all come from the ONE footer read per staged file.
    * `colIds` (lower-cased column name → Iceberg field id) keys the
    * bounds and stamps parquet field ids into the files. Shared by
    * the append/overwrite commit and the CoW rewrite so the two
    * staging lanes can never drift. */
  private def stageData(df: DataFrame, root: Path,
      fs: org.apache.hadoop.fs.FileSystem,
      fields: Seq[IcebergTransforms.IcePartField],
      txn: String, colIds: Map[String, Int]): Seq[StagedFile] = {
    import org.apache.spark.sql.functions.col
    val spark = df.sparkSession
    val stage = new Path(root, s"__graft_ice_stage_$txn")
    val stamped = stampFieldIds(df, colIds)
    if (fields.isEmpty)
      stamped.write.mode("overwrite").parquet(stage.toString)
    else stamped.select(df.columns.map(col).toIndexedSeq ++
        fields.map(f => IcebergTransforms.stagingColumn(f)
          .as(s"__part_${f.name}")): _*)
      .write.mode("overwrite")
      .partitionBy(fields.map(f => s"__part_${f.name}"): _*)
      .parquet(stage.toString)
    val dataDir = new Path(root, "data")
    fs.mkdirs(dataDir)
    val out = scala.collection.mutable.ArrayBuffer.empty[StagedFile]
    def walk(p: Path, tuple: Map[String, Option[String]]): Unit =
      fs.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        if (st.isDirectory && n.contains("=")) {
          val Array(k, v) = n.split("=", 2)
          val value =
            if (v == "__HIVE_DEFAULT_PARTITION__") None
            else Some(java.net.URLDecoder.decode(v, "UTF-8"))
          walk(st.getPath, tuple + (k.stripPrefix("__part_") -> value))
        } else if (n.endsWith(".parquet") && !n.startsWith(".")) {
          val pin = org.apache.parquet.hadoop.util.HadoopInputFile
            .fromPath(st.getPath, spark.sparkContext.hadoopConfiguration)
          val preader = org.apache.parquet.hadoop.ParquetFileReader.open(pin)
          val (rows, lower, upper) = try {
            val footer = preader.getFooter
            val (lo, hi) = IcebergBounds.footerBounds(footer, df.schema,
              colIds)
            (preader.getRecordCount, lo, hi)
          } finally preader.close()
          if (rows > 0L) { // empty shuffle partitions stage 0-row parts
            val dst = new Path(dataDir, s"$txn-${out.length}.parquet")
            if (!fs.rename(st.getPath, dst)) throw new IllegalStateException(
              s"iceberg write: staging rename to $dst failed")
            out += StagedFile(dst.toString, rows, st.getLen, tuple,
              lower, upper)
          }
        }
      }
    try walk(stage, Map.empty) finally fs.delete(stage, true)
    out.toSeq
  }

  private def tupleJson(tuple: Map[String, Option[String]]): String = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.createObjectNode()
    tuple.foreach { case (k, v) =>
      v match {
        case Some(x) => node.put(k, x)
        case None => node.putNull(k)
      }
    }
    mapper.writeValueAsString(node)
  }

  private def commit(df: DataFrame, tablePath: String,
      carryForward: Boolean, partitionBy: Seq[String] = Nil): Long = {
    val spark = df.sparkSession
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(root, "metadata")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

    val metaRe = "^v(\\d+)\\.metadata\\.json$".r
    val versions =
      if (!fs.exists(metaDir)) Seq.empty[Int]
      else fs.listStatus(metaDir).map(_.getPath.getName)
        .collect { case metaRe(v) => v.toInt }.sorted.toSeq
    val creating = versions.isEmpty

    val prev = versions.lastOption.map { v =>
      val in = fs.open(new Path(metaDir, s"v$v.metadata.json"))
      try mapper.readTree(in.readAllBytes()) finally in.close()
    }
    prev.foreach { meta =>
      // schema compatibility by name/type against the CURRENT schema
      val schemaNode = Option(meta.get("schemas")).map { arr =>
        val cur = Option(meta.get("current-schema-id")).map(_.asInt)
          .getOrElse(0)
        (0 until arr.size).map(arr.get)
          .find(_.get("schema-id").asInt == cur).getOrElse(arr.get(0))
      }.getOrElse(meta.get("schema"))
      val want = (0 until schemaNode.get("fields").size).map { i =>
        val f = schemaNode.get("fields").get(i)
        f.get("name").asText.toLowerCase -> f.get("type").asText
      }.toMap
      val have = df.schema.fields.map(f =>
        f.name.toLowerCase -> sparkToIceberg(f.dataType)).toMap
      require(want == have,
        s"iceberg write: schema mismatch — table has $want, " +
          s"append has $have")
    }
    // partition spec: creation parses the caller's partitionBy
    // (identity columns or transform spellings — parseWriteSpec);
    // appends derive the spec from the table's metadata; a
    // caller-supplied list on append must agree canonically
    def parseCallerSpec(): Seq[IcebergTransforms.IcePartField] =
      partitionBy.zipWithIndex.map { case (s, i) =>
        val (tr, p, src) = IcebergTransforms.parseWriteSpec(s)
        val srcIdx = df.schema.fieldNames
          .indexWhere(_.equalsIgnoreCase(src))
        require(srcIdx >= 0,
          s"iceberg write: partition source column `$src` is not in " +
            "the schema")
        IcebergTransforms.IcePartField(
          IcebergTransforms.defaultFieldName(tr, p, src), tr, p,
          df.schema.fieldNames(srcIdx), srcIdx + 1, 1000 + i,
          df.schema.fields(srcIdx).dataType)
      }
    val partFields: Seq[IcebergTransforms.IcePartField] = prev match {
      case None => parseCallerSpec()
      case Some(meta) =>
        val fields = specFields(meta)
        if (partitionBy.nonEmpty) {
          val asked = parseCallerSpec()
            .map(f => (f.transform, f.param, f.sourceName.toLowerCase))
          val have = fields
            .map(f => (f.transform, f.param, f.sourceName.toLowerCase))
          require(asked == have,
            s"iceberg write: partitionBy $partitionBy does not match " +
              s"the table's partition spec ${have.mkString(", ")}")
        }
        fields
    }

    // ---- stage data files: partitioned tables split ONE TUPLE PER
    // FILE via Hive-style staging over COMPUTED transform columns, so
    // every source column stays IN the data files (the spec's storage
    // rule for identity transforms; derived transforms never store
    // their result in data files) while the tuple is recoverable from
    // the staging directory names ----
    // column name → Iceberg field id: the TABLE's schema ids when it
    // exists (external creators may not use 1..N), else position+1
    // (matching the creation schema JSON below)
    val colIds: Map[String, Int] = prev match {
      case Some(meta) =>
        val sn = schemaNodeOf(meta)
        (0 until sn.get("fields").size).flatMap { i =>
          val f = sn.get("fields").get(i)
          Option(f.get("id")).map(id =>
            f.get("name").asText.toLowerCase -> id.asInt)
        }.toMap
      case None => df.schema.fieldNames.zipWithIndex
        .map { case (n, i) => n.toLowerCase -> (i + 1) }.toMap
    }
    val txn = java.util.UUID.randomUUID().toString
    val added = stageData(df, root, fs, partFields, txn, colIds)
    require(added.nonEmpty || !creating,
      "iceberg write: refusing to create a table from zero files")

    val newSeq = prev.flatMap(m =>
      Option(m.get("last-sequence-number")).map(_.asLong))
      .getOrElse(0L) + 1
    val snapshotId = math.abs(java.util.UUID.randomUUID()
      .getMostSignificantBits)

    fs.mkdirs(metaDir)
    // new manifest: the added files (typed partition struct + the
    // partition_json convenience form on partitioned tables)
    val eSchema = entrySchemaFor(partFields)
    val mPath = new Path(metaDir, s"m-$txn.avro")
    val mLen = writeAvro(fs, mPath, eSchema, added.map { sf =>
      mkEntry(eSchema, 1, 0, sf.path, sf.rows,
        if (partFields.isEmpty) None else Some(sf.tuple), partFields,
        sf.sizeBytes, sf.lower, sf.upper)
    }, "write")
    // new manifest list: previous snapshot's manifests carried forward
    val carried: Seq[GenericRecord] = (if (carryForward) prev
      else None).flatMap { meta =>
      Option(meta.get("current-snapshot-id")).map(_.asLong).flatMap { id =>
        val snaps = meta.get("snapshots")
        (0 until snaps.size).map(snaps.get)
          .find(_.get("snapshot-id").asLong == id)
      }
    }.map(snap => avroRecords(fs, snap.get("manifest-list").asText)
      .map(copyListRecord)).getOrElse(Seq.empty)
    val newRef = {
      val r = new GenericData.Record(listSchema)
      r.put("manifest_path", mPath.toString)
      r.put("manifest_length", mLen)
      r.put("content", 0)
      r.put("sequence_number", newSeq)
      r
    }
    val mlPath = new Path(metaDir, s"snap-$snapshotId.avro")
    writeAvro(fs, mlPath, listSchema, carried :+ newRef, "write")

    // ---- metadata vN+1 (the commit claim) ----
    def fieldsJson = df.schema.fields.zipWithIndex.map { case (f, i) =>
      s"""{"id": ${i + 1}, "name": "${f.name}", "required": false, """ +
        s""""type": "${sparkToIceberg(f.dataType)}"}"""
    }.mkString("[", ", ", "]")
    // creation of a partitioned table records the REAL transforms in
    // the spec JSON (spec field-ids start at 1000 per the spec's
    // partition-field-id rule; source-id = the schema field id)
    val freshSpecs =
      if (partFields.isEmpty) None
      else Some(partFields.map { f =>
        s"""{"name": "${f.name}", "transform": "${IcebergTransforms
          .transformString(f.transform, f.param)}", """ +
          s""""source-id": ${f.sourceId}, "field-id": ${f.fieldId}}"""
      }.mkString("""[{"spec-id": 0, "fields": [""", ", ", "]}]"))
    val newMetaJson = snapshotMetadataJson(prev, tablePath, newSeq,
      snapshotId, mlPath.toString,
      s"""[{"type": "struct", "schema-id": 0, "fields": $fieldsJson}]""",
      freshSpecs)
    val newVersion = versions.lastOption.getOrElse(0) + 1
    commitFailpoint()
    claimVersion(fs, metaDir, newVersion, newMetaJson, "write",
      "rerun the append against the new state")
    snapshotId
  }

  /** LIGHTWEIGHT row-level DELETE — the merge-on-read path (the
    * reference's lightweight `DELETE FROM` masks rows instead of
    * rewriting parts; Iceberg's spelling of that mask is a v2 POSITION
    * DELETE file, spec §"Position Delete Files"): matched VISIBLE rows
    * (existing deletes apply first) write as (file_path, pos) parquet
    * rows sorted within each delete file, registered through a
    * content=1 delete manifest in a new snapshot that carries every
    * prior manifest forward — NO data file rewrites, so a selective
    * delete costs one scan plus a delete-row-count write no matter the
    * table size. Returns (new snapshot id, rows deleted); zero matches
    * commit nothing. */
  def deleteLightweight(spark: org.apache.spark.sql.SparkSession,
      tablePath: String, predicate: org.apache.spark.sql.Column)
      : (Long, Long) = {
    import org.apache.spark.sql.functions.{broadcast, col}
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(root, "metadata")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val metaRe = "^v(\\d+)\\.metadata\\.json$".r
    val versions =
      if (!fs.exists(metaDir)) Seq.empty[Int]
      else fs.listStatus(metaDir).map(_.getPath.getName)
        .collect { case metaRe(v) => v.toInt }.sorted.toSeq
    require(versions.nonEmpty,
      s"iceberg delete: $tablePath is not an Iceberg table")
    val meta = {
      val in = fs.open(new Path(metaDir,
        s"v${versions.last}.metadata.json"))
      try mapper.readTree(in.readAllBytes()) finally in.close()
    }
    require(Option(meta.get("format-version")).forall(_.asInt >= 2),
      "iceberg delete: row-level deletes need format-version 2")
    // round 15/16: partitioned tables are fine here — position deletes
    // anchor on (file_path, pos); the spec parse below is a loud gate
    // against transforms outside the supported family (delete-file
    // manifest entries carry no tuple; the reader applies deletes by
    // path, and data-file manifest pruning is untouched)
    specFields(meta)
    val curSnapId = Option(meta.get("current-snapshot-id")).map(_.asLong)
      .getOrElse(throw new IllegalArgumentException(
        "iceberg delete: metadata has no current-snapshot-id"))

    // data-file list for the normalized-path → manifest-spelling map
    val snaps = meta.get("snapshots")
    val manifestList = (0 until snaps.size).map(snaps.get)
      .find(_.get("snapshot-id").asLong == curSnapId)
      .getOrElse(throw new IllegalArgumentException(
        s"iceberg delete: snapshot $curSnapId missing"))
      .get("manifest-list").asText
    def normPath(p: String): String = {
      val uri = try new java.net.URI(p)
        catch { case _: java.net.URISyntaxException => null }
      if (uri != null && uri.getPath != null && uri.getPath.nonEmpty)
        uri.getPath
      else p
    }
    val dataPaths = Seq.newBuilder[String]
    avroRecords(fs, manifestList).foreach { m =>
      avroRecords(fs, m.get("manifest_path").toString).foreach { e =>
        val status = optField(e, "status").map(_.toString.toInt).getOrElse(1)
        val d = e.get("data_file").asInstanceOf[GenericRecord]
        val content = optField(d, "content").map(_.toString.toInt)
          .getOrElse(0)
        if (status != 2 && content == 0)
          dataPaths += d.get("file_path").toString
      }
    }
    val files = dataPaths.result()

    // ---- matched VISIBLE rows → (manifest-spelled file_path, pos);
    // the read applies existing pos/eq deletes, so a row deletes at
    // most once ----
    val visible = IcebergSource.read(spark, tablePath,
      withPosColumns = true)
    val matched = visible.filter(predicate)
      .select(col("__ice_file"), col("__ice_pos").as("pos"))
    val lookup = spark.createDataFrame(
      files.map(p => (normPath(p), p))).toDF("__ice_file", "file_path")
    // persisted: the matched set drives a count, a null audit and the
    // delete-file write — one scan, not three
    val delRows0 = matched.join(broadcast(lookup), Seq("__ice_file"),
      "left").select(col("file_path"), col("pos")).persist()
    val matchedRows = delRows0.count()
    if (matchedRows == 0L) { delRows0.unpersist(); return (curSnapId, 0L) }
    require(delRows0.filter(col("file_path").isNull).isEmpty,
      "iceberg delete: a matched row's file is not in the manifests — " +
        "refusing rather than writing an unanchored position delete")

    // ---- write the delete file(s): sorted by (file_path, pos) within
    // each file, the spec's ordering rule; ~1M delete rows per file ----
    val parts = math.max(1L, math.min(
      spark.sessionState.conf.numShufflePartitions.toLong,
      (matchedRows + 999999L) / 1000000L)).toInt
    val txn = java.util.UUID.randomUUID().toString
    val stage = new Path(root, s"__graft_ice_stage_$txn")
    try {
      // stamp the spec's RESERVED field ids into the parquet schema
      // (iceberg.apache.org/spec "Reserved field ids": file_path =
      // 2147483546, pos = 2147483545) — the in-repo reader resolves by
      // name, but external Iceberg engines resolve delete-file columns
      // by FIELD ID; Spark writes parquet field ids from the
      // `parquet.field.id` column metadata
      def withId(name: String, id: Long) = col(name).as(name,
        new org.apache.spark.sql.types.MetadataBuilder()
          .putLong("parquet.field.id", id).build())
      delRows0
        .select(withId("file_path", 2147483546L), withId("pos", 2147483545L))
        .repartitionByRange(parts, col("file_path"), col("pos"))
        .sortWithinPartitions("file_path", "pos")
        .write.mode("overwrite").parquet(stage.toString)
    } finally delRows0.unpersist()
    val dataDir = new Path(root, "data")
    fs.mkdirs(dataDir)
    val added = fs.listStatus(stage).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") &&
        fs.getFileStatus(p).getLen > 0)
      .zipWithIndex.map { case (p, i) =>
        val dst = new Path(dataDir, s"$txn-delete-$i.parquet")
        if (!fs.rename(p, dst)) throw new IllegalStateException(
          s"iceberg delete: staging rename to $dst failed")
        dst.toString
      }.toSeq
    fs.delete(stage, true)
    // empty-partition parquet parts still hold a footer; re-check the
    // actual row presence per part so no 0-row delete file registers
    val nonEmpty = added.filter(p =>
      !spark.read.parquet(p).isEmpty)

    // ---- new delete manifest + manifest list carrying all forward ----
    val newSeq = Option(meta.get("last-sequence-number")).map(_.asLong)
      .getOrElse(0L) + 1
    val snapshotId = math.abs(java.util.UUID.randomUUID()
      .getMostSignificantBits)
    val mPath = new Path(metaDir, s"m-$txn.avro")
    val mLen = writeAvro(fs, mPath, entrySchema, nonEmpty.map { f =>
      val d = new GenericData.Record(
        entrySchema.getField("data_file").schema())
      d.put("content", 1); d.put("file_path", f)
      d.put("file_format", "PARQUET")
      d.put("record_count", matchedRows / math.max(nonEmpty.length, 1))
      d.put("file_size_in_bytes",
        scala.util.Try(fs.getFileStatus(new Path(f)).getLen)
          .getOrElse(0L))
      val e = new GenericData.Record(entrySchema)
      e.put("status", 1); e.put("data_file", d); e
    }, "delete")
    val carried: Seq[GenericRecord] =
      avroRecords(fs, manifestList).map(copyListRecord)
    val newRef = {
      val r = new GenericData.Record(listSchema)
      r.put("manifest_path", mPath.toString)
      r.put("manifest_length", mLen)
      r.put("content", 1)
      r.put("sequence_number", newSeq)
      r
    }
    val mlPath = new Path(metaDir, s"snap-$snapshotId.avro")
    writeAvro(fs, mlPath, listSchema, carried :+ newRef, "delete")

    // ---- metadata vN+1 claim ----
    val newMetaJson = snapshotMetadataJson(Some(meta), tablePath, newSeq,
      snapshotId, mlPath.toString, "[]")
    val newVersion = versions.last + 1
    commitFailpoint()
    claimVersion(fs, metaDir, newVersion, newMetaJson, "delete",
      "the captured delete set is stale, refusing")
    (snapshotId, matchedRows)
  }

  /** Row-level DELETE through a copy-on-write manifest rewrite (the
    * spec's CoW path: rewrite the files holding matches, publish a new
    * snapshot whose single data manifest lists every survivor —
    * untouched files carry over BY REFERENCE, never rewritten, so a
    * selective predicate touches a file-count-proportional slice of a
    * 100 TB table). Returns (new snapshot id, rows deleted); zero
    * matches commit nothing and return the current snapshot id. */
  def delete(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      predicate: org.apache.spark.sql.Column): (Long, Long) =
    mutate(spark, tablePath, predicate, None)

  /** Row-level UPDATE: the same copy-on-write rewrite with assignments
    * applied WHERE the predicate holds, cast to the declared column
    * type; unmatched rows in rewritten files carry over verbatim. */
  def update(spark: org.apache.spark.sql.SparkSession, tablePath: String,
      assignments: Seq[(String, org.apache.spark.sql.Column)],
      predicate: org.apache.spark.sql.Column): (Long, Long) = {
    require(assignments.nonEmpty, "iceberg update: no assignments")
    mutate(spark, tablePath, predicate, Some(assignments))
  }

  private def mutate(spark: org.apache.spark.sql.SparkSession,
      tablePath: String, predicate: org.apache.spark.sql.Column,
      assignments: Option[Seq[(String, org.apache.spark.sql.Column)]])
      : (Long, Long) = {
    import org.apache.spark.sql.functions.{col, expr, not, when}
    val what = if (assignments.isEmpty) "delete" else "update"
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(root, "metadata")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val metaRe = "^v(\\d+)\\.metadata\\.json$".r
    val versions =
      if (!fs.exists(metaDir)) Seq.empty[Int]
      else fs.listStatus(metaDir).map(_.getPath.getName)
        .collect { case metaRe(v) => v.toInt }.sorted.toSeq
    require(versions.nonEmpty,
      s"iceberg $what: $tablePath is not an Iceberg table")
    val meta = {
      val in = fs.open(new Path(metaDir,
        s"v${versions.last}.metadata.json"))
      try mapper.readTree(in.readAllBytes()) finally in.close()
    }
    val schemaNode = Option(meta.get("schemas")).map { arr =>
      val cur = Option(meta.get("current-schema-id")).map(_.asInt)
        .getOrElse(0)
      (0 until arr.size).map(arr.get)
        .find(_.get("schema-id").asInt == cur).getOrElse(arr.get(0))
    }.getOrElse(meta.get("schema"))
    // evolved tables (multiple schemas) must resolve data-file columns
    // by field id here too, or the rewrite would read renamed columns
    // as null and persist the damage
    val resolveByFieldId =
      Option(meta.get("schemas")).exists(_.size > 1)
    if (resolveByFieldId)
      spark.conf.set("spark.sql.parquet.fieldId.read.enabled", "true")
    val schema = IcebergSource.structOf(schemaNode,
      withFieldIds = resolveByFieldId)
    // round 15/16: partitioned CoW — rewritten survivors re-stage per
    // tuple through the shared stageData lane (identity AND derived
    // transforms, recomputed from the source columns); an UPDATE that
    // assigns any partition SOURCE column would MOVE rows across
    // partitions and refuses loudly
    val partFields = specFields(meta)
    assignments.foreach(_.foreach { case (c, _) =>
      require(!partFields.exists(_.sourceName.equalsIgnoreCase(c)),
        s"iceberg update: assigning partition source column `$c` would " +
          "move rows across partitions — delete + re-insert instead")
    })
    assignments.foreach(_.foreach { case (c, _) =>
      require(schema.fieldNames.exists(_.equalsIgnoreCase(c)),
        s"iceberg update: no column `$c` in the table schema")
    })
    val curSnapId = Option(meta.get("current-snapshot-id")).map(_.asLong)
      .getOrElse(throw new IllegalArgumentException(
        s"iceberg $what: metadata has no current-snapshot-id"))
    val snaps = meta.get("snapshots")
    val manifestList = (0 until snaps.size).map(snaps.get)
      .find(_.get("snapshot-id").asLong == curSnapId)
      .getOrElse(throw new IllegalArgumentException(
        s"iceberg $what: snapshot $curSnapId missing")).get("manifest-list")
      .asText

    // ---- current state: data files (+ record counts); delete files
    // make the current state depend on anti-join semantics a manifest
    // rewrite cannot preserve — LOUD, compact first ----
    // untouched entries must ECHO their tuple, size and column bounds
    // or manifest pruning goes blind after every mutation
    val dataFiles = Seq.newBuilder[ExistingFile]
    avroRecords(fs, manifestList).foreach { m =>
      avroRecords(fs, m.get("manifest_path").toString).foreach { e =>
        val status = optField(e, "status").map(_.toString.toInt).getOrElse(1)
        if (status != 2) {
          val d = e.get("data_file").asInstanceOf[GenericRecord]
          val content = optField(d, "content").map(_.toString.toInt)
            .getOrElse(0)
          require(content == 0,
            s"iceberg $what: the current snapshot carries row-level " +
              "delete files — rewrite (compact) the table before " +
              "copy-on-write mutations")
          dataFiles += ExistingFile(d.get("file_path").toString,
            optField(d, "record_count").map(_.toString.toLong)
              .getOrElse(0L),
            IcebergTransforms.entryTuple(d, partFields, mapper),
            optField(d, "file_size_in_bytes").map(_.toString.toLong)
              .getOrElse(0L),
            IcebergBounds.boundsOfEntry(d, "lower_bounds"),
            IcebergBounds.boundsOfEntry(d, "upper_bounds"))
        }
      }
    }
    val files = dataFiles.result()
    require(files.nonEmpty, s"iceberg $what: the table has no data files")

    // ---- which files hold matches (per-file counts only) ----
    val normSql = (c: String) =>
      s"url_decode(replace(regexp_replace($c, " +
        s"'^[a-zA-Z][a-zA-Z0-9+.-]*:(//[^/]*)?', ''), '+', '%2B'))"
    def normPath(p: String): String = {
      val uri = try new java.net.URI(p)
        catch { case _: java.net.URISyntaxException => null }
      if (uri != null && uri.getPath != null && uri.getPath.nonEmpty)
        uri.getPath
      else p
    }
    val matchedCounts = spark.read.schema(schema)
      .parquet(files.map(_.path): _*)
      .withColumn("__ice_file", expr(normSql("_metadata.file_path")))
      .filter(predicate)
      .groupBy(col("__ice_file")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    if (matchedCounts.isEmpty) return (curSnapId, 0L)
    val matchedRows = matchedCounts.values.sum
    val byNorm = files.map(f => normPath(f.path) -> f.path).toMap
    val matched = matchedCounts.keySet.map(k =>
      byNorm.getOrElse(k, throw new IllegalStateException(
        s"iceberg $what: scanned file $k is not in the manifests")))

    // ---- rewrite ONLY the matched files ----
    val scoped = spark.read.schema(schema).parquet(matched.toSeq: _*)
    val rewritten = assignments match {
      // survivors = rows NOT exactly-true: not(predicate) is NULL for
      // NULL-valued rows, which would silently drop them
      case None =>
        scoped.filter(not(predicate <=> org.apache.spark.sql.functions
          .lit(true)))
      case Some(asn) =>
        asn.foldLeft(scoped) { case (d, (c, e)) =>
          val declared = schema.fields.find(_.name.equalsIgnoreCase(c)).get
          d.withColumn(declared.name,
            when(predicate, e.cast(declared.dataType))
              .otherwise(col(declared.name)))
        }
    }
    val txn = java.util.UUID.randomUUID().toString
    // shared staging lane: per-tuple splitting on partitioned tables
    // (transforms recomputed from the source columns), exact footer
    // record counts either way
    // column name -> field id from the table's schema node, for the
    // rewritten files' bounds keys and parquet field-id stamping
    val colIds: Map[String, Int] = {
      val sn = schemaNodeOf(meta)
      (0 until sn.get("fields").size).flatMap { i =>
        val f = sn.get("fields").get(i)
        Option(f.get("id")).map(id =>
          f.get("name").asText.toLowerCase -> id.asInt)
      }.toMap
    }
    val added = stageData(rewritten, root, fs, partFields, txn, colIds)

    // ---- one new manifest: survivors by reference (status 0,
    // original record counts + their original tuples) + rewritten
    // files (status 1) ----
    val newSeq = Option(meta.get("last-sequence-number")).map(_.asLong)
      .getOrElse(0L) + 1
    val snapshotId = math.abs(java.util.UUID.randomUUID()
      .getMostSignificantBits)
    val eSchema = entrySchemaFor(partFields)
    val untouched = files.filterNot(f => matched(f.path))
    val mPath = new Path(metaDir, s"m-$txn.avro")
    val mLen = writeAvro(fs, mPath, eSchema,
      untouched.map { f =>
        mkEntry(eSchema, 0, 0, f.path, f.rows, f.tuple, partFields,
          f.sizeBytes, f.lower, f.upper)
      } ++
        added.map { sf =>
          mkEntry(eSchema, 1, 0, sf.path, sf.rows,
            if (partFields.isEmpty) None else Some(sf.tuple), partFields,
            sf.sizeBytes, sf.lower, sf.upper)
        }, what)
    val mlPath = new Path(metaDir, s"snap-$snapshotId.avro")
    val ref = new GenericData.Record(listSchema)
    ref.put("manifest_path", mPath.toString)
    ref.put("manifest_length", mLen)
    ref.put("content", 0)
    ref.put("sequence_number", newSeq)
    writeAvro(fs, mlPath, listSchema, Seq(ref), what)

    // ---- metadata vN+1 claim (put-if-absent; collision is LOUD —
    // the captured file set is stale) ----
    val newMetaJson = snapshotMetadataJson(Some(meta), tablePath, newSeq,
      snapshotId, mlPath.toString, "[]")
    val newVersion = versions.last + 1
    commitFailpoint()
    claimVersion(fs, metaDir, newVersion, newMetaJson, what,
      "the captured file set is stale, refusing")
    (snapshotId, matchedRows)
  }

  /** ROLLBACK — set the CURRENT snapshot back to `snapshotId` (the
    * spec's set-current-snapshot): metadata v(N+1) re-points
    * current-snapshot-id at the target, which must still be present
    * in the snapshot list. Nothing deletes — newer snapshots stay
    * travelable (and a later expireSnapshots can drop them);
    * last-sequence-number is untouched so future commits keep the
    * spec's monotonic sequence numbers. Returns the new metadata
    * version. */
  def rollback(spark: org.apache.spark.sql.SparkSession,
      tablePath: String, snapshotId: Long): Int = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(root, "metadata")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val metaRe = "^v(\\d+)\\.metadata\\.json$".r
    val versions =
      if (!fs.exists(metaDir)) Seq.empty[Int]
      else fs.listStatus(metaDir).map(_.getPath.getName)
        .collect { case metaRe(v) => v.toInt }.sorted.toSeq
    require(versions.nonEmpty,
      s"iceberg rollback: $tablePath is not an Iceberg table")
    val meta = {
      val in = fs.open(new Path(metaDir,
        s"v${versions.last}.metadata.json"))
      try mapper.readTree(in.readAllBytes()) finally in.close()
    }
    val snaps = Option(meta.get("snapshots")).toSeq
      .flatMap(arr => (0 until arr.size).map(arr.get))
    require(snaps.exists(_.get("snapshot-id").asLong == snapshotId),
      s"iceberg rollback: snapshot $snapshotId is not present in the " +
        "metadata (expired?) — unrecoverable")
    val out = meta.deepCopy[com.fasterxml.jackson.databind.JsonNode]()
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    out.put("current-snapshot-id", snapshotId)
    val newVersion = versions.last + 1
    commitFailpoint()
    claimVersion(fs, metaDir, newVersion,
      mapper.writeValueAsString(out), "rollback",
      "rerun the rollback against the new state")
    newVersion
  }

  /** EXPIRE SNAPSHOTS — the maintenance verb that bounds a long-lived
    * table's metadata (Iceberg's expire_snapshots): keep the newest
    * `keepLast` snapshots by timestamp (the CURRENT snapshot is always
    * kept), publish metadata v(N+1) with the expired snapshots removed
    * from the snapshot list, then delete the manifest lists, manifests
    * and data/delete files referenced ONLY by expired snapshots.
    *
    * Durability discipline: the ONLY destructive step (file deletion)
    * runs AFTER the new metadata version is durably claimed — a crash
    * mid-delete leaves unreferenced orphans, never a broken table; a
    * crash before the claim changes nothing. Time travel to an expired
    * snapshot id is LOUD afterwards (the reader's snapshot lookup
    * throws on ids absent from the metadata). Returns (snapshots
    * expired, files deleted). */
  def expireSnapshots(spark: org.apache.spark.sql.SparkSession,
      tablePath: String, keepLast: Int = 1): (Int, Int) = {
    require(keepLast >= 1, "iceberg expire: keepLast must be >= 1")
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(root, "metadata")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val metaRe = "^v(\\d+)\\.metadata\\.json$".r
    val versions =
      if (!fs.exists(metaDir)) Seq.empty[Int]
      else fs.listStatus(metaDir).map(_.getPath.getName)
        .collect { case metaRe(v) => v.toInt }.sorted.toSeq
    require(versions.nonEmpty,
      s"iceberg expire: $tablePath is not an Iceberg table")
    val meta = {
      val in = fs.open(new Path(metaDir,
        s"v${versions.last}.metadata.json"))
      try mapper.readTree(in.readAllBytes()) finally in.close()
    }
    val snapsNode = Option(meta.get("snapshots")).getOrElse(
      throw new IllegalArgumentException(
        "iceberg expire: metadata has no snapshots"))
    val snaps = (0 until snapsNode.size).map(snapsNode.get)
    val currentId = Option(meta.get("current-snapshot-id")).map(_.asLong)
      .getOrElse(throw new IllegalArgumentException(
        "iceberg expire: metadata has no current-snapshot-id"))
    val byNewest = snaps.sortBy(s =>
      -Option(s.get("timestamp-ms")).map(_.asLong).getOrElse(0L))
    val keepIds: Set[Long] = (byNewest.take(keepLast)
      .map(_.get("snapshot-id").asLong) :+ currentId).toSet
    val expired = snaps.filterNot(s => keepIds(s.get("snapshot-id").asLong))
    if (expired.isEmpty) return (0, 0)

    // referenced paths per snapshot family: (manifest lists, manifests,
    // data/delete files) — all metadata-scale driver walks, exactly how
    // the reader replays them
    def refsOf(snapSeq: Seq[com.fasterxml.jackson.databind.JsonNode])
        : (Set[String], Set[String], Set[String]) = {
      val lists = Set.newBuilder[String]
      val manifests = Set.newBuilder[String]
      val files = Set.newBuilder[String]
      snapSeq.foreach { s =>
        val ml = s.get("manifest-list").asText
        lists += ml
        avroRecords(fs, ml).foreach { m =>
          val mp = m.get("manifest_path").toString
          manifests += mp
          avroRecords(fs, mp).foreach { e =>
            val status = optField(e, "status").map(_.toString.toInt)
              .getOrElse(1)
            if (status != 2)
              files += e.get("data_file").asInstanceOf[GenericRecord]
                .get("file_path").toString
          }
        }
      }
      (lists.result(), manifests.result(), files.result())
    }
    val retained = snaps.filter(s => keepIds(s.get("snapshot-id").asLong))
    val (keepLists, keepManifests, keepFiles) = refsOf(retained)
    val (expLists, expManifests, expFiles) = refsOf(expired)

    // ---- metadata v(N+1): the same deep-copy passthrough as commits,
    // with the expired snapshots dropped from the list ----
    val out = meta.deepCopy[com.fasterxml.jackson.databind.JsonNode]()
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    val newSnaps = mapper.createArrayNode()
    retained.foreach(newSnaps.add)
    out.set[com.fasterxml.jackson.databind.JsonNode]("snapshots", newSnaps)
    // snapshot-log entries naming expired snapshots must go too (spec:
    // the log may only reference snapshots present in the table)
    Option(out.get("snapshot-log")).foreach { log =>
      val filtered = mapper.createArrayNode()
      (0 until log.size).map(log.get).foreach { e =>
        if (keepIds(e.get("snapshot-id").asLong)) filtered.add(e)
      }
      out.set[com.fasterxml.jackson.databind.JsonNode](
        "snapshot-log", filtered)
    }
    val newVersion = versions.last + 1
    commitFailpoint()
    claimVersion(fs, metaDir, newVersion,
      mapper.writeValueAsString(out), "expire",
      "rerun the expiration against the new state")

    // ---- destructive step LAST: delete what only expired snapshots
    // referenced (deletion failures leave orphans — logged, not fatal:
    // the committed metadata is already consistent) ----
    var deleted = 0
    ((expLists -- keepLists) ++ (expManifests -- keepManifests) ++
      (expFiles -- keepFiles)).foreach { p =>
      try { if (fs.delete(new Path(p), false)) deleted += 1 }
      catch { case e: java.io.IOException =>
        System.err.println(s"iceberg expire: could not delete $p: $e")
      }
    }
    (expired.size, deleted)
  }
}
