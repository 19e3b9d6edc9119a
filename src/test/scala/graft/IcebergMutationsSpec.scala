package graft

import org.apache.avro.Schema
import org.apache.avro.file.DataFileWriter
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.functions.col

/** Iceberg row-level DELETE / UPDATE through copy-on-write manifest
  * rewrites (round 14 — the Iceberg twin of DeltaMutationsSpec): only
  * files holding matches rewrite (untouched files carry over BY
  * REFERENCE in the new manifest), prior snapshots stay travelable by
  * id, delete-file-carrying snapshots refuse loudly, and a metadata
  * claim collision is loud. */
class IcebergMutationsSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._
  import graft.sources.{IcebergSink, IcebergSource}

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_imut_$tag")
      .toString + "/t"

  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)

  test("delete: survivors read back; untouched files carry by " +
      "reference; prior snapshot stays travelable; zero-match is a " +
      "no-op") {
    val dir = tmp("del")
    try {
      val snap0 = IcebergSink.append(
        (1L to 20L).map(i => (i, s"n$i")).toDF("id", "name")
          .repartition(4), dir)
      val dataBefore = new java.io.File(dir, "data").listFiles
        .map(_.getName).toSet
      val (snap1, n) = IcebergSink.delete(spark, dir,
        col("id") % 5 === 0)
      assert(n == 4L, s"ids 5/10/15/20 → 4 rows, got $n")
      assert(snap1 != snap0)
      val now = IcebergSource.read(spark, dir)
        .select("id").as[Long].collect().sorted.toSeq
      assert(now == (1L to 20L).filterNot(_ % 5 == 0))
      // prior snapshot still travelable by id
      assert(IcebergSource.read(spark, dir, snapshotId = Some(snap0))
        .count() == 20L)
      // untouched data files survive with identity (the rewrite adds
      // files, never renames survivors); at least one new file exists
      val dataAfter = new java.io.File(dir, "data").listFiles
        .map(_.getName).toSet
      assert(dataBefore.subsetOf(dataAfter))
      assert((dataAfter -- dataBefore).nonEmpty)
      // zero-match: same snapshot id back, no new metadata version
      val versionsBefore = new java.io.File(dir, "metadata").listFiles
        .count(_.getName.endsWith(".metadata.json"))
      val (snap2, n2) = IcebergSink.delete(spark, dir, col("id") > 999)
      assert(snap2 == snap1 && n2 == 0L)
      assert(new java.io.File(dir, "metadata").listFiles
        .count(_.getName.endsWith(".metadata.json")) == versionsBefore)
    } finally cleanup(dir)
  }

  test("update applies WHERE-matched only and casts to the declared " +
      "type; unknown column refuses; dialect lanes commit and report") {
    val dir = tmp("upd")
    try {
      IcebergSink.append(
        (1L to 12L).map(i => (i, i * 10L)).toDF("id", "v"), dir)
      val (_, n) = IcebergSink.update(spark, dir,
        Seq("v" -> (col("v") * 2 + org.apache.spark.sql.functions
          .expr("0.5"))), // double → casts back to long (truncates .5)
        col("id") <= 3)
      assert(n == 3L)
      val got = IcebergSource.read(spark, dir)
        .select("id", "v").as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == (1L to 12L).map(i =>
        (i, if (i <= 3) i * 20 else i * 10)))
      val e = intercept[IllegalArgumentException] {
        IcebergSink.update(spark, dir, Seq("nope" -> col("v")),
          col("id") === 1)
      }
      assert(e.getMessage.contains("no column"))
      // dialect lanes: ALTER TABLE … DELETE is the copy-on-write
      // mutation (DELETE FROM is the LIGHTWEIGHT position-delete lane,
      // pinned separately — a CoW update after it would refuse)
      val del = graft.sql.ClickHouseSql.sql(spark,
        s"ALTER TABLE FUNCTION iceberg('$dir') DELETE WHERE id % 4 = 0")
        .collect().head
      assert(del.getLong(1) == 3L)
      val upd = graft.sql.ClickHouseSql.sql(spark,
        s"ALTER TABLE FUNCTION iceberg('$dir') UPDATE v = v + 1 " +
          "WHERE id = 1").collect().head
      assert(upd.getLong(1) == 1L)
      val after = graft.sql.ClickHouseSql.sql(spark,
        s"SELECT id, v FROM iceberg('$dir') ORDER BY id")
        .as[(Long, Long)].collect().toSeq
      assert(after == (1L to 12L).filter(_ % 4 != 0)
        .map(i => (i, if (i == 1) i * 20 + 1
          else if (i <= 3) i * 20 else i * 10)))
    } finally cleanup(dir)
  }

  test("rows where the DELETE predicate evaluates to NULL survive the " +
      "manifest rewrite") {
    val dir = tmp("nullpred")
    try {
      IcebergSink.append(
        Seq((1L, java.lang.Long.valueOf(5L)),
          (2L, null.asInstanceOf[java.lang.Long]),
          (3L, java.lang.Long.valueOf(7L)))
          .toDF("id", "v").repartition(1), dir)
      val (_, n) = IcebergSink.delete(spark, dir, col("v") === 5L)
      assert(n == 1L)
      val ids = IcebergSource.read(spark, dir)
        .select("id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(2L, 3L),
        s"the NULL-valued row must survive the rewrite, got $ids")
    } finally cleanup(dir)
  }

  test("a snapshot carrying row-level delete files refuses mutations " +
      "loudly; a metadata claim collision is loud") {
    val dir = tmp("gate")
    try {
      IcebergSink.append(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), dir)
      // hand-add a v(N+1) metadata whose snapshot carries a position-
      // delete manifest (content=1 data_file), per the spec
      val entrySchema = new Schema.Parser().parse("""
        {"type":"record","name":"manifest_entry","fields":[
          {"name":"status","type":"int"},
          {"name":"data_file","type":{"type":"record","name":"data_file",
            "fields":[
              {"name":"content","type":"int","default":0},
              {"name":"file_path","type":"string"},
              {"name":"file_format","type":"string"},
              {"name":"record_count","type":"long"}]}}]}""")
      val listSchema = new Schema.Parser().parse("""
        {"type":"record","name":"manifest_file","fields":[
          {"name":"manifest_path","type":"string"},
          {"name":"manifest_length","type":"long"},
          {"name":"content","type":"int","default":0},
          {"name":"sequence_number","type":"long","default":0}]}""")
      def rec(sch: Schema)(fill: GenericData.Record => Unit)
          : GenericRecord = {
        val r = new GenericData.Record(sch); fill(r); r
      }
      def writeAvro(path: String, sch: Schema,
          rows: Seq[GenericRecord]): Unit = {
        val w = new DataFileWriter[GenericRecord](
          new GenericDatumWriter[GenericRecord](sch))
        w.create(sch, new java.io.File(path))
        try rows.foreach(w.append) finally w.close()
      }
      val mPath = s"$dir/metadata/m-del.avro"
      writeAvro(mPath, entrySchema, Seq(rec(entrySchema) { e =>
        e.put("status", 1)
        e.put("data_file",
          rec(entrySchema.getField("data_file").schema()) { d =>
            d.put("content", 1)
            d.put("file_path", s"$dir/data/fake-posdel.parquet")
            d.put("file_format", "PARQUET")
            d.put("record_count", 1L)
          })
      }))
      val mlPath = s"$dir/metadata/snap-99.avro"
      writeAvro(mlPath, listSchema, Seq(rec(listSchema) { r =>
        r.put("manifest_path", mPath); r.put("manifest_length", 1L)
        r.put("content", 1); r.put("sequence_number", 2L)
      }))
      java.nio.file.Files.writeString(java.nio.file.Path.of(
        dir, "metadata", "v2.metadata.json"),
        s"""{"format-version": 2, "table-uuid": "t",
          "current-snapshot-id": 99, "current-schema-id": 0,
          "last-sequence-number": 2,
          "schemas": [{"type": "struct", "schema-id": 0, "fields": [
            {"id": 1, "name": "id", "required": false, "type": "long"},
            {"id": 2, "name": "v", "required": false, "type": "string"}]}],
          "snapshots": [{"snapshot-id": 99,
            "manifest-list": "$mlPath"}]}""")
      java.nio.file.Files.writeString(java.nio.file.Path.of(
        dir, "metadata", "version-hint.text"), "2")
      val e = intercept[IllegalArgumentException] {
        IcebergSink.delete(spark, dir, col("id") === 1)
      }
      assert(e.getMessage.contains("delete files"))
      // roll back to the clean v1 state and pin the collision path
      java.nio.file.Files.delete(java.nio.file.Path.of(
        dir, "metadata", "v2.metadata.json"))
      java.nio.file.Files.writeString(java.nio.file.Path.of(
        dir, "metadata", "version-hint.text"), "1")
      IcebergSink.commitFailpoint = () =>
        java.nio.file.Files.writeString(java.nio.file.Path.of(
          dir, "metadata", "v2.metadata.json"), "{}")
      val e2 = try intercept[IllegalStateException] {
        IcebergSink.delete(spark, dir, col("id") === 1)
      } finally IcebergSink.commitFailpoint = () => ()
      assert(e2.getMessage.contains("claimed"))
    } finally cleanup(dir)
  }
}
