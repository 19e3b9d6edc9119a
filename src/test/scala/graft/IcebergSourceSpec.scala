package graft

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.hadoop.fs.Path

/** Native Iceberg read (round-13; reference IcebergMetadata.cpp —
  * metadata.json → manifest-list avro → manifest avro → parquet).
  * Fixtures are spec-conformant files built by hand with the stock
  * Avro library — which is the point: no connector jar involved. */
class IcebergSourceSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._

  private val manifestListSchema = new Schema.Parser().parse("""
    {"type":"record","name":"manifest_file","fields":[
      {"name":"manifest_path","type":"string"},
      {"name":"manifest_length","type":"long"},
      {"name":"content","type":"int","default":0}]}""")

  private val manifestEntrySchema = new Schema.Parser().parse("""
    {"type":"record","name":"manifest_entry","fields":[
      {"name":"status","type":"int"},
      {"name":"data_file","type":{"type":"record","name":"data_file","fields":[
        {"name":"content","type":"int","default":0},
        {"name":"file_path","type":"string"},
        {"name":"file_format","type":"string"},
        {"name":"record_count","type":"long"}]}}]}""")

  private def writeAvro(path: String, schema: Schema,
      rows: Seq[GenericRecord]): Unit = {
    val w = new DataFileWriter[GenericRecord](
      new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, new java.io.File(path))
    try rows.foreach(w.append) finally w.close()
  }

  private def entry(status: Int, filePath: String,
      content: Int = 0): GenericRecord = {
    val df = new GenericData.Record(
      manifestEntrySchema.getField("data_file").schema())
    df.put("content", content)
    df.put("file_path", filePath)
    df.put("file_format", "PARQUET")
    df.put("record_count", 1L)
    val e = new GenericData.Record(manifestEntrySchema)
    e.put("status", status)
    e.put("data_file", df)
    e
  }

  private def manifestRef(path: String, content: Int = 0): GenericRecord = {
    val r = new GenericData.Record(manifestListSchema)
    r.put("manifest_path", path)
    r.put("manifest_length", 1L)
    r.put("content", content)
    r
  }

  private def dataFile(dir: String, name: String,
      rows: Seq[(Long, String)]): String = {
    val tmp = s"$dir/__tmp"
    rows.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new Path(tmp)).map(_.getPath)
      .find(_.getName.startsWith("part-")).get
    fs.mkdirs(new Path(s"$dir/data"))
    val dst = new Path(s"$dir/data", name)
    fs.rename(part, dst)
    fs.delete(new Path(tmp), true)
    dst.toString
  }

  private def metadataJson(snapshotId: Long, manifestList: String): String =
    s"""{
      "format-version": 2,
      "table-uuid": "graft-iceberg-spec",
      "current-snapshot-id": $snapshotId,
      "current-schema-id": 0,
      "schemas": [{"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "id", "required": false, "type": "long"},
        {"id": 2, "name": "v", "required": false, "type": "string"}]}],
      "snapshots": [{"snapshot-id": $snapshotId,
        "manifest-list": "$manifestList"}]
    }"""

  test("metadata → manifest-list → manifest replay: added + existing " +
      "entries read, DELETED entries drop") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_iceberg").toString
    try {
      val f1 = dataFile(dir, "d1.parquet", Seq((1L, "one"), (2L, "two")))
      val f2 = dataFile(dir, "d2.parquet", Seq((3L, "three")))
      val f3 = dataFile(dir, "d3.parquet", Seq((9L, "gone")))
      java.nio.file.Files.createDirectories(
        java.nio.file.Path.of(dir, "metadata"))
      val mPath = s"$dir/metadata/m1.avro"
      writeAvro(mPath, manifestEntrySchema, Seq(
        entry(1, f1), entry(0, f2), entry(2, f3))) // 2 = deleted
      val mlPath = s"$dir/metadata/snap-1.avro"
      writeAvro(mlPath, manifestListSchema, Seq(manifestRef(mPath)))
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(dir, "metadata", "v1.metadata.json"),
        metadataJson(101L, mlPath))
      val rows = graft.sources.IcebergSource.read(spark, dir)
        .collect().map(r => (r.getLong(0), r.getString(1)))
        .sortBy(_._1).toSeq
      assert(rows == Seq((1L, "one"), (2L, "two"), (3L, "three")),
        "added+existing files read; the DELETED entry must drop")
      // dialect table-function lane
      val n = graft.sql.ClickHouseSql.sql(spark,
        s"SELECT count() AS n FROM iceberg('$dir')")
        .collect().head.getLong(0)
      assert(n == 3L)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("format-version-1 manifests (no `content` fields anywhere) read " +
      "fine — absent Avro fields default instead of throwing (review fix)") {
    val v1ListSchema = new Schema.Parser().parse("""
      {"type":"record","name":"manifest_file","fields":[
        {"name":"manifest_path","type":"string"},
        {"name":"manifest_length","type":"long"}]}""")
    val v1EntrySchema = new Schema.Parser().parse("""
      {"type":"record","name":"manifest_entry","fields":[
        {"name":"status","type":"int"},
        {"name":"data_file","type":{"type":"record","name":"data_file",
          "fields":[{"name":"file_path","type":"string"},
            {"name":"file_format","type":"string"},
            {"name":"record_count","type":"long"}]}}]}""")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_iceberg_v1").toString
    try {
      val f1 = dataFile(dir, "d1.parquet", Seq((1L, "a"), (2L, "b")))
      java.nio.file.Files.createDirectories(
        java.nio.file.Path.of(dir, "metadata"))
      val d = new GenericData.Record(
        v1EntrySchema.getField("data_file").schema())
      d.put("file_path", f1); d.put("file_format", "PARQUET")
      d.put("record_count", 2L)
      val e = new GenericData.Record(v1EntrySchema)
      e.put("status", 1); e.put("data_file", d)
      val mPath = s"$dir/metadata/m1.avro"
      writeAvro(mPath, v1EntrySchema, Seq(e))
      val ml = new GenericData.Record(v1ListSchema)
      ml.put("manifest_path", mPath); ml.put("manifest_length", 1L)
      val mlPath = s"$dir/metadata/snap-1.avro"
      writeAvro(mlPath, v1ListSchema, Seq(ml))
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(dir, "metadata", "v1.metadata.json"),
        metadataJson(55L, mlPath))
      assert(graft.sources.IcebergSource.read(spark, dir).count() == 2L,
        "v1 manifests without content fields must read, not throw")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("timestamp time travel (iceberg_timestamp_ms) picks the newest " +
      "snapshot at-or-before the instant; the SET lane routes it") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_iceberg_ts").toString
    try {
      val f1 = dataFile(dir, "d1.parquet", Seq((1L, "old")))
      val f2 = dataFile(dir, "d2.parquet", Seq((2L, "new")))
      java.nio.file.Files.createDirectories(
        java.nio.file.Path.of(dir, "metadata"))
      val m1 = s"$dir/metadata/m1.avro"
      writeAvro(m1, manifestEntrySchema, Seq(entry(1, f1)))
      val m2 = s"$dir/metadata/m2.avro"
      writeAvro(m2, manifestEntrySchema, Seq(entry(1, f1), entry(1, f2)))
      val ml1 = s"$dir/metadata/snap-1.avro"
      writeAvro(ml1, manifestListSchema, Seq(manifestRef(m1)))
      val ml2 = s"$dir/metadata/snap-2.avro"
      writeAvro(ml2, manifestListSchema, Seq(manifestRef(m2)))
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(dir, "metadata", "v1.metadata.json"),
        s"""{
          "format-version": 2, "table-uuid": "ts",
          "current-snapshot-id": 20, "current-schema-id": 0,
          "schemas": [{"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "id", "required": false, "type": "long"},
            {"id": 2, "name": "v", "required": false, "type": "string"}]}],
          "snapshots": [
            {"snapshot-id": 10, "timestamp-ms": 1000,
             "manifest-list": "$ml1"},
            {"snapshot-id": 20, "timestamp-ms": 2000,
             "manifest-list": "$ml2"}]
        }""")
      import graft.sources.IcebergSource
      assert(IcebergSource.read(spark, dir).count() == 2L, "latest")
      assert(IcebergSource.read(spark, dir,
        asOfTimestampMs = Some(1500L)).count() == 1L,
        "ts=1500 must pick snapshot 10")
      intercept[IllegalArgumentException] {
        IcebergSource.read(spark, dir, asOfTimestampMs = Some(500L))
      }
      // the reference's SETTINGS route (0 = latest)
      val ch = (q: String) => graft.sql.ClickHouseSql.sql(spark, q)
      ch("SET iceberg_timestamp_ms = 1500")
      try assert(ch(s"SELECT count() AS n FROM iceberg('$dir')")
        .collect().head.getLong(0) == 1L)
      finally ch("SET iceberg_timestamp_ms = 0")
      ch("SET iceberg_snapshot_id = 10")
      try assert(ch(s"SELECT count() AS n FROM iceberg('$dir')")
        .collect().head.getLong(0) == 1L)
      finally ch("SET iceberg_snapshot_id = 0")
      // icebergCluster: the cluster arg is a routing hint — same read
      assert(ch(s"SELECT count() AS n FROM icebergCluster('c1', '$dir')")
        .collect().head.getLong(0) == 2L)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("a malformed delete manifest (data files inside) rejects loudly; " +
      "version-hint picks the metadata version; unknown snapshot id is " +
      "loud") {
    // (round 14: WELL-FORMED position/equality delete manifests now
    // APPLY instead of refusing — IcebergDeletesSpec pins those)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_iceberg2").toString
    try {
      val f1 = dataFile(dir, "d1.parquet", Seq((1L, "x")))
      java.nio.file.Files.createDirectories(
        java.nio.file.Path.of(dir, "metadata"))
      val mPath = s"$dir/metadata/m1.avro"
      writeAvro(mPath, manifestEntrySchema, Seq(entry(1, f1)))
      // v1: a DELETE manifest (content = 1) in the list
      val badList = s"$dir/metadata/snap-bad.avro"
      writeAvro(badList, manifestListSchema,
        Seq(manifestRef(mPath), manifestRef(mPath, content = 1)))
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(dir, "metadata", "v1.metadata.json"),
        metadataJson(7L, badList))
      // v2: clean
      val okList = s"$dir/metadata/snap-ok.avro"
      writeAvro(okList, manifestListSchema, Seq(manifestRef(mPath)))
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(dir, "metadata", "v2.metadata.json"),
        metadataJson(8L, okList))
      // no hint: picks v2 (max) — clean read
      assert(graft.sources.IcebergSource.read(spark, dir).count() == 1L)
      // hint to v1: the delete manifest must be loud
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(dir, "metadata", "version-hint.text"), "1")
      val e = intercept[IllegalArgumentException] {
        graft.sources.IcebergSource.read(spark, dir)
      }
      assert(e.getMessage.contains("delete manifest"))
      java.nio.file.Files.delete(
        java.nio.file.Path.of(dir, "metadata", "version-hint.text"))
      val e2 = intercept[IllegalArgumentException] {
        graft.sources.IcebergSource.read(spark, dir, Some(999L))
      }
      assert(e2.getMessage.contains("snapshot"))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }
}
