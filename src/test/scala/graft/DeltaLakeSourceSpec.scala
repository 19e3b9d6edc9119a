package graft

import org.apache.hadoop.fs.Path

// checkpoint action rows (top-level for the Product encoder)
case class CkAdd(path: String, partitionValues: Map[String, String])
case class CkRemove(path: String)
case class CkMeta(schemaString: String, partitionColumns: Seq[String])
case class CkProt(minReaderVersion: Int)
case class CkRow(add: Option[CkAdd], remove: Option[CkRemove],
    metaData: Option[CkMeta], protocol: Option[CkProt])

/** Native Delta Lake log replay (round-13 — the lakehouse-read gap;
  * reference DeltaLakeMetadata.cpp replays the same public protocol).
  * The fixtures are hand-built per the delta.io PROTOCOL.md layout —
  * no connector jar exists in this container to generate them, which
  * is exactly the point of a native reader. */
class DeltaLakeSourceSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._

  private val schemaString =
    """{"type":"struct","fields":[
      |{"name":"id","type":"long","nullable":true,"metadata":{}},
      |{"name":"name","type":"string","nullable":true,"metadata":{}},
      |{"name":"p","type":"string","nullable":true,"metadata":{}}]}"""
      .stripMargin.replace("\n", "")

  /** Write `rows` as a single parquet data file named `name` in `dir`. */
  private def dataFile(dir: String, name: String,
      rows: Seq[(Long, String)]): Unit = {
    val tmp = s"$dir/__tmp_$name"
    rows.toDF("id", "name").coalesce(1).write
      .mode("overwrite").parquet(tmp)
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new Path(tmp))
      .map(_.getPath).find(_.getName.startsWith("part-")).get
    fs.rename(part, new Path(dir, name))
    fs.delete(new Path(tmp), true)
  }

  private def jsonEsc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def writeCommit(dir: String, version: Long,
      lines: Seq[String]): Unit = {
    val p = java.nio.file.Path.of(dir, "_delta_log",
      f"$version%020d.json")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, lines.mkString("\n") + "\n")
  }

  private def metaLine: String =
    s"""{"metaData":{"id":"t1","format":{"provider":"parquet"},""" +
      s""""schemaString":"${jsonEsc(schemaString)}",""" +
      s""""partitionColumns":["p"],"configuration":{}}}"""

  private def buildTable(dir: String): Unit = {
    dataFile(dir, "d1.parquet", Seq((1L, "one"), (2L, "two")))
    dataFile(dir, "d2.parquet", Seq((3L, "three")))
    dataFile(dir, "d3.parquet", Seq((4L, "four")))
    writeCommit(dir, 0L, Seq(
      """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
      metaLine,
      """{"add":{"path":"d1.parquet","partitionValues":{"p":"a"},"size":1,"modificationTime":1,"dataChange":true}}""",
      """{"add":{"path":"d2.parquet","partitionValues":{"p":"b"},"size":1,"modificationTime":1,"dataChange":true}}"""))
    writeCommit(dir, 1L, Seq(
      """{"remove":{"path":"d2.parquet","deletionTimestamp":2,"dataChange":true}}""",
      """{"add":{"path":"d3.parquet","partitionValues":{"p":"b"},"size":1,"modificationTime":2,"dataChange":true}}"""))
  }

  test("log replay: adds, removes, partition-column restoration, and " +
      "versionAsOf time travel") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_delta").toString
    try {
      buildTable(dir)
      val now = graft.sources.DeltaLakeSource.read(spark, dir)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
        .sortBy(_._1).toSeq
      assert(now == Seq((1L, "one", "a"), (2L, "two", "a"),
        (4L, "four", "b")),
        "v1 must see d1 + d3, with d2 removed and p restored from the log")
      val v0 = graft.sources.DeltaLakeSource
        .read(spark, dir, versionAsOf = Some(0L))
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(v0 == Seq(1L, 2L, 3L), "time travel to v0 must see d1 + d2")
      intercept[IllegalArgumentException] {
        graft.sources.DeltaLakeSource.read(spark, dir,
          versionAsOf = Some(9L))
      }
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("checkpoint seeding: a table whose JSON commits are gone still " +
      "reads from the checkpoint parquet") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_delta_ck").toString
    try {
      buildTable(dir)
      // checkpoint carrying the v1 state
      val ck = Seq(
        CkRow(None, None, Some(CkMeta(schemaString, Seq("p"))),
          Some(CkProt(1))),
        CkRow(Some(CkAdd("d1.parquet", Map("p" -> "a"))), None, None, None),
        CkRow(Some(CkAdd("d3.parquet", Map("p" -> "b"))), None, None, None))
      val tmp = s"$dir/__ck_tmp"
      ck.toDS().coalesce(1).write.mode("overwrite").parquet(tmp)
      val fs = new Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val part = fs.listStatus(new Path(tmp)).map(_.getPath)
        .find(_.getName.startsWith("part-")).get
      fs.rename(part,
        new Path(s"$dir/_delta_log", f"${1L}%020d.checkpoint.parquet"))
      fs.delete(new Path(tmp), true)
      // drop the JSON commits — the checkpoint must carry the state
      fs.delete(new Path(s"$dir/_delta_log", f"${0L}%020d.json"), false)
      fs.delete(new Path(s"$dir/_delta_log", f"${1L}%020d.json"), false)
      val rows = graft.sources.DeltaLakeSource.read(spark, dir)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(rows == Seq(1L, 2L, 4L),
        "the checkpoint alone must reconstruct the v1 state")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("_last_checkpoint integrity: a pointer to a missing checkpoint " +
      "is loud; a valid pointer reads; deltaLakeCluster spelling routes") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_delta_lc").toString
    try {
      buildTable(dir)
      // dangling pointer → loud
      java.nio.file.Files.writeString(java.nio.file.Path.of(
        dir, "_delta_log", "_last_checkpoint"),
        """{"version":9,"size":3}""")
      val e = intercept[IllegalArgumentException] {
        graft.sources.DeltaLakeSource.read(spark, dir)
      }
      assert(e.getMessage.contains("_last_checkpoint"))
      java.nio.file.Files.delete(java.nio.file.Path.of(
        dir, "_delta_log", "_last_checkpoint"))
      // cluster spelling = same read with a routing hint dropped
      val n = graft.sql.ClickHouseSql.sql(spark,
        s"SELECT count() AS n FROM deltaLakeCluster('c1', '$dir')")
        .collect().head.getLong(0)
      assert(n == 3L)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("protocol gate: an unimplemented v3 reader feature rejects " +
      "loudly; a non-delta directory rejects loudly") {
    // (round 14: deletionVectors AND columnMapping are implemented —
    // DeltaDvReadSpec / DeltaColumnMappingSpec pin those transitions;
    // anything else in readerFeatures must still refuse)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_delta_p").toString
    try {
      dataFile(dir, "d1.parquet", Seq((1L, "x")))
      writeCommit(dir, 0L, Seq(
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
          """"readerFeatures":["collations"]}}""",
        metaLine,
        """{"add":{"path":"d1.parquet","partitionValues":{"p":"a"},"size":1,"modificationTime":1,"dataChange":true}}"""))
      val e = intercept[IllegalArgumentException] {
        graft.sources.DeltaLakeSource.read(spark, dir)
      }
      assert(e.getMessage.contains("collations"))
      val e2 = intercept[Exception] {
        graft.sources.DeltaLakeSource.read(spark, "/tmp")
      }
      assert(e2.getMessage.contains("_delta_log"))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }
}
