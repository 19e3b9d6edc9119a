package graft

import org.apache.avro.Schema
import org.apache.avro.generic.GenericData
import org.apache.hadoop.fs.Path

/** Hudi merge-on-read (round 14 — beyond the reference, which reads
  * base files only): log blocks per the spec's block layout
  * (sources/HudiLogFormat) merge over the base scan with ONE key
  * shuffle. Pins: upsert overrides base, later blocks override earlier
  * ones, a winning delete tombstone drops the key, a delete + later
  * re-insert survives, log-only inserts appear, and block framing is
  * golden (magic / trailer total / header map). */
class HudiMoRSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._
  import graft.sources.{HudiLogFormat, HudiSource}

  private val avroSchema = new Schema.Parser().parse("""
    {"type":"record","name":"r","fields":[
      {"name":"_hoodie_record_key","type":"string"},
      {"name":"id","type":"long"},
      {"name":"v","type":"string"}]}""")

  private def rec(key: String, id: Long, v: String)
      : org.apache.avro.generic.GenericRecord = {
    val r = new GenericData.Record(avroSchema)
    r.put("_hoodie_record_key", key); r.put("id", id); r.put("v", v)
    r
  }

  private def baseFile(dir: String, name: String,
      rows: Seq[(String, Long, String)]): Unit = {
    val tmp = s"$dir/__tmp"
    rows.toDF("_hoodie_record_key", "id", "v").coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(dir))
    val part = fs.listStatus(new Path(tmp)).map(_.getPath)
      .find(_.getName.startsWith("part-")).get
    fs.rename(part, new Path(dir, name))
    fs.delete(new Path(tmp), true)
  }

  test("upsert/delete/re-insert merge semantics across ordered log " +
      "files; log-only inserts appear; pure-CoW groups untouched") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hudi_mor2").toString
    try {
      java.nio.file.Files.createDirectories(
        java.nio.file.Path.of(dir, ".hoodie"))
      val fs = new Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      // fg1 (p=a): base k1..k4 + two log versions
      baseFile(s"$dir/p=a", "fg1_0-1-0_20240101000000.parquet",
        Seq(("k1", 1L, "base1"), ("k2", 2L, "base2"),
          ("k3", 3L, "base3"), ("k4", 4L, "base4")))
      val log1 = new Path(s"$dir/p=a", ".fg1_20240101000000.log.1_0-1-0")
      // block 1: upsert k2, insert k5; block 2 (same file): delete k3
      HudiLogFormat.appendDataBlock(fs, log1, "20240102000000",
        avroSchema, Seq(rec("k2", 2L, "log2"), rec("k5", 5L, "log5")))
      HudiLogFormat.appendDeleteBlock(fs, log1, "20240102000001",
        Seq("k3"))
      // later log VERSION: re-upsert k2 again (must beat log.1), and
      // delete k4 then re-insert it (the re-insert wins)
      val log2 = new Path(s"$dir/p=a", ".fg1_20240101000000.log.2_0-1-0")
      HudiLogFormat.appendDeleteBlock(fs, log2, "20240103000000",
        Seq("k4"))
      HudiLogFormat.appendDataBlock(fs, log2, "20240103000001",
        avroSchema, Seq(rec("k2", 2L, "log2b"), rec("k4", 4L, "back4")))
      // fg2 (p=b): pure CoW group, no logs
      baseFile(s"$dir/p=b", "fg2_0-1-0_20240101000000.parquet",
        Seq(("k9", 9L, "only")))
      val got = HudiSource.read(spark, dir)
        .select("_hoodie_record_key", "id", "v")
        .as[(String, Long, String)].collect().sortBy(_._1).toSeq
      assert(got == Seq(
        ("k1", 1L, "base1"), // untouched base row
        ("k2", 2L, "log2b"), // latest log version wins
        ("k4", 4L, "back4"), // delete then re-insert survives
        ("k5", 5L, "log5"), // log-only insert
        ("k9", 9L, "only")), // pure-CoW group
        s"merge mismatch: $got") // k3 deleted
      // dialect lane reads the merged state too
      val n = graft.sql.ClickHouseSql.sql(spark,
        s"SELECT count() AS n FROM hudi('$dir')").collect().head.getLong(0)
      assert(n == 5L)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("golden framing: magic, trailer total, header map and content " +
      "survive a byte-level roundtrip; foreign block types are loud") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hudi_log").toString
    try {
      val fs = new Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val p = new Path(dir, ".fg_1.log.1_0")
      HudiLogFormat.appendDataBlock(fs, p, "20240101000000", avroSchema,
        Seq(rec("k", 7L, "x")))
      HudiLogFormat.appendDeleteBlock(fs, p, "20240101000001", Seq("k"))
      val bytes = java.nio.file.Files.readAllBytes(
        java.nio.file.Path.of(dir, ".fg_1.log.1_0"))
      assert(new String(bytes.take(6), "UTF-8") == "#HUDI#")
      // block 1's framing: remaining-length at [6,14), trailer total at
      // the end of the block equals magic + 8 + remaining
      val bb = java.nio.ByteBuffer.wrap(bytes)
      val remaining = bb.getLong(6)
      val total = bb.getLong(6 + 8 + remaining.toInt - 8)
      assert(total == 6 + 8 + remaining)
      val events = HudiLogFormat.readLogFile(bytes)
      assert(events.map(e => (e.key, e.isDelete)) ==
        Seq(("k", false), ("k", true)))
      assert(events.head.fields("v") == "x" &&
        events.head.fields("id") == 7L)
      // corrupt magic is loud
      val bad = bytes.clone(); bad(0) = 'X'.toByte
      val e = intercept[IllegalArgumentException] {
        HudiLogFormat.readLogFile(bad)
      }
      assert(e.getMessage.contains("magic"))
      // foreign block type is loud (patch the type int in block 1:
      // offset 6 magic + 8 remaining + 4 version)
      val foreign = bytes.clone()
      val tOff = 6 + 8 + 4
      java.nio.ByteBuffer.wrap(foreign).putInt(tOff, 9)
      val e2 = intercept[IllegalArgumentException] {
        HudiLogFormat.readLogFile(foreign)
      }
      assert(e2.getMessage.contains("block type"))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("partitionEq scopes a MoR merge to one partition's groups: " +
      "other partitions' base slices AND logs never list (round 17)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_hmor_pe")
      .toString + "/t"
    try {
      val d = (1L to 12L).map(i =>
        (s"k$i", i, s"a$i", if (i % 2 == 0) "e" else "o"))
        .toDF("_hoodie_record_key", "id", "v", "p")
      graft.sources.HudiSink.upsert(d, dir, partitionBy = Seq("p"))
      // updates land log blocks in BOTH partitions
      graft.sources.HudiSink.upsert(
        Seq(("k4", 4L, "UPD4", "e"), ("k5", 5L, "UPD5", "o"))
          .toDF("_hoodie_record_key", "id", "v", "p"), dir)
      val scoped = HudiSource.read(spark, dir,
        partitionEq = Map("p" -> "e"))
      val got = scoped.select("_hoodie_record_key", "v")
        .as[(String, String)].collect().toMap
      assert(got == Map("k2" -> "a2", "k4" -> "UPD4", "k6" -> "a6",
        "k8" -> "a8", "k10" -> "a10", "k12" -> "a12"), s"got $got")
      // the scan's base files all live in p=e — the other partition's
      // slices (and its log blocks) never listed
      val ins = scoped.inputFiles
      assert(ins.nonEmpty && ins.forall(_.contains("p=e")),
        s"scoped scan must only read p=e files: ${ins.mkString(", ")}")
      // a full read still serves everything
      assert(HudiSource.read(spark, dir).count() == 12L)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)
  }
}
