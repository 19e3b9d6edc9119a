package graft.sources

import java.io.ByteArrayInputStream

import org.apache.avro.file.DataFileStream
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Native Apache Iceberg READ — completes the round-13 lakehouse-read
  * set (Delta, Hudi, Iceberg) without connector jars, the same way the
  * reference's IcebergMetadata.cpp does: replay the PUBLIC table spec
  * (iceberg.apache.org/spec):
  *
  *  1. `metadata/vN.metadata.json` (newest N, or the `version-hint.text`
  *     pointer) carries the current snapshot id, the snapshot list, and
  *     the Iceberg schema (field list with ids/types);
  *  2. the snapshot's `manifest-list` is an Avro file whose records
  *     point at manifests (`manifest_path`, v2 `content`: 0 = data,
  *     1 = deletes);
  *  3. each manifest is an Avro file of entries — `status` (0 existing,
  *     1 added, 2 DELETED) wrapping a `data_file` record
  *     (`file_path`, `file_format`);
  *  4. active data files = non-deleted entries of the data manifests,
  *     read as ONE distributed parquet scan with the schema mapped from
  *     Iceberg types (identity-partitioned columns live IN the data
  *     files per the spec, so nothing needs reconstruction).
  *
  * Loud gates (never silently wrong): v2 DELETE manifests / delete
  * files (position or equality deletes change row visibility),
  * non-parquet data files, and missing metadata. Avro manifests are
  * metadata-scale — they read driver-side exactly as the reference
  * reads them, while the DATA scan stays distributed.
  */
object IcebergSource {

  def read(spark: SparkSession, tablePath: String,
      snapshotId: Option[Long] = None): DataFrame = {
    val fs = new Path(tablePath).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val metaDir = new Path(tablePath, "metadata")
    require(fs.exists(metaDir),
      s"iceberg: $tablePath has no metadata directory — not an Iceberg table")
    val metaRe = "^v(\\d+)\\.metadata\\.json$".r
    val hint = new Path(metaDir, "version-hint.text")
    val version: Int =
      if (fs.exists(hint)) {
        val in = fs.open(hint)
        try new String(in.readAllBytes(), "UTF-8").trim.toInt
        finally in.close()
      } else fs.listStatus(metaDir).map(_.getPath.getName)
        .collect { case metaRe(v) => v.toInt } match {
          case Array() => throw new IllegalArgumentException(
            s"iceberg: no vN.metadata.json under $metaDir")
          case vs => vs.max
        }
    val metaFile = new Path(metaDir, s"v$version.metadata.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val meta = {
      val in = fs.open(metaFile)
      try mapper.readTree(in.readAllBytes())
      finally in.close()
    }

    // ---- schema ----
    val schemaNode = Option(meta.get("schemas")).map { arr =>
      val cur = Option(meta.get("current-schema-id")).map(_.asInt)
        .getOrElse(0)
      (0 until arr.size).map(arr.get)
        .find(s => s.get("schema-id").asInt == cur)
        .getOrElse(arr.get(arr.size - 1))
    }.orElse(Option(meta.get("schema"))).getOrElse(
      throw new IllegalArgumentException("iceberg: metadata has no schema"))
    val schema = structOf(schemaNode)

    // ---- snapshot → manifest list ----
    val snaps = Option(meta.get("snapshots")).getOrElse(
      throw new IllegalArgumentException("iceberg: metadata has no snapshots"))
    val targetId = snapshotId.getOrElse(
      Option(meta.get("current-snapshot-id")).map(_.asLong).getOrElse(
        throw new IllegalArgumentException(
          "iceberg: metadata has no current-snapshot-id")))
    val snap = (0 until snaps.size).map(snaps.get)
      .find(_.get("snapshot-id").asLong == targetId)
      .getOrElse(throw new IllegalArgumentException(
        s"iceberg: snapshot $targetId not present in the metadata"))
    val manifestList = snap.get("manifest-list").asText

    // ---- manifest replay ----
    def avroRecords(path: String): Seq[GenericRecord] = {
      val p = new Path(path)
      val in = fs.open(p)
      val bytes = try in.readAllBytes() finally in.close()
      val reader = new DataFileStream[GenericRecord](
        new ByteArrayInputStream(bytes),
        new GenericDatumReader[GenericRecord]())
      try {
        val out = Seq.newBuilder[GenericRecord]
        while (reader.hasNext) out += reader.next()
        out.result()
      } finally reader.close()
    }

    // v1 manifests carry no `content` fields at all — GenericRecord.get
    // THROWS on an absent name (avro-1.12 "Not a valid schema field"),
    // so absence must check the writer schema first, defaulting to the
    // v1 meaning (0 = data)
    def optField(r: GenericRecord, name: String): Option[AnyRef] =
      if (r.getSchema.getField(name) == null) None else Option(r.get(name))

    val dataFiles = avroRecords(manifestList).flatMap { m =>
      val content = optField(m, "content").map(_.toString.toInt).getOrElse(0)
      if (content != 0) throw new IllegalArgumentException(
        "iceberg: the snapshot carries DELETE manifests (v2 row-level " +
          "deletes) — this native reader refuses rather than serving " +
          "deleted rows")
      val manifestPath = m.get("manifest_path").toString
      avroRecords(manifestPath).flatMap { e =>
        val status = optField(e, "status").map(_.toString.toInt).getOrElse(1)
        if (status == 2) None // deleted entry
        else {
          val df = e.get("data_file").asInstanceOf[GenericRecord]
          optField(df, "content").map(_.toString.toInt).foreach(c =>
            if (c != 0) throw new IllegalArgumentException(
              "iceberg: delete files present — unsupported"))
          val fmt = optField(df, "file_format").map(_.toString)
            .getOrElse("PARQUET")
          if (!fmt.equalsIgnoreCase("parquet"))
            throw new IllegalArgumentException(
              s"iceberg: data file format $fmt is not supported " +
                "(parquet only)")
          Some(df.get("file_path").toString)
        }
      }
    }
    if (dataFiles.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else spark.read.schema(schema).parquet(dataFiles: _*)
  }

  /** Iceberg schema JSON → Spark StructType (spec type names). */
  private def structOf(node: com.fasterxml.jackson.databind.JsonNode)
      : StructType = {
    val fields = node.get("fields")
    StructType((0 until fields.size).map { i =>
      val f = fields.get(i)
      StructField(f.get("name").asText, typeOf(f.get("type")),
        nullable = !Option(f.get("required")).exists(_.asBoolean))
    })
  }

  private def typeOf(t: com.fasterxml.jackson.databind.JsonNode): DataType =
    if (t.isTextual) t.asText match {
      case "boolean" => BooleanType
      case "int" => IntegerType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "date" => DateType
      case "time" => LongType // micros-of-day (spec representation)
      case "timestamp" => TimestampNTZType
      case "timestamptz" => TimestampType
      case "string" | "uuid" => StringType
      case "binary" => BinaryType
      case s if s.startsWith("decimal(") =>
        val Array(p, sc) = s.stripPrefix("decimal(").stripSuffix(")")
          .split(",").map(_.trim.toInt)
        DecimalType(p, sc)
      case s if s.startsWith("fixed") => BinaryType
      case other => throw new IllegalArgumentException(
        s"iceberg: unsupported type '$other'")
    } else t.get("type").asText match {
      case "struct" => structOf(t)
      case "list" =>
        ArrayType(typeOf(t.get("element")),
          containsNull = !Option(t.get("element-required"))
            .exists(_.asBoolean))
      case "map" =>
        MapType(typeOf(t.get("key")), typeOf(t.get("value")),
          valueContainsNull = !Option(t.get("value-required"))
            .exists(_.asBoolean))
      case other => throw new IllegalArgumentException(
        s"iceberg: unsupported complex type '$other'")
    }
}
