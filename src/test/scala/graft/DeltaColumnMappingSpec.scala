package graft

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Delta column mapping READ (round 14 — closes the minReaderVersion-2
  * gate; PROTOCOL.md "Column Mapping"): parquet files store columns
  * under delta.columnMapping.physicalName, the log's partitionValues
  * key by physical names, and the reader casts the physicalized scan
  * back to the logical schema (nested fields rename through the
  * positional struct cast). */
class DeltaColumnMappingSpec extends SparkFunSuite {

  private def jsonEsc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  // logical: id Long, info struct<label String>, p String (partition)
  // physical: col-aaa, col-ccc { col-bbb }, col-ppp
  private val schemaString = (
    """{"type":"struct","fields":[""" +
      """{"name":"id","type":"long","nullable":true,"metadata":""" +
      """{"delta.columnMapping.id":1,"delta.columnMapping.physicalName":"col-aaa"}},""" +
      """{"name":"info","type":{"type":"struct","fields":[""" +
      """{"name":"label","type":"string","nullable":true,"metadata":""" +
      """{"delta.columnMapping.id":3,"delta.columnMapping.physicalName":"col-bbb"}}]},""" +
      """"nullable":true,"metadata":""" +
      """{"delta.columnMapping.id":2,"delta.columnMapping.physicalName":"col-ccc"}},""" +
      """{"name":"p","type":"string","nullable":true,"metadata":""" +
      """{"delta.columnMapping.id":4,"delta.columnMapping.physicalName":"col-ppp"}}]}""")

  private def metaLine(mode: String): String =
    s"""{"metaData":{"id":"cm","format":{"provider":"parquet"},""" +
      s""""schemaString":"${jsonEsc(schemaString)}",""" +
      s""""partitionColumns":["p"],""" +
      s""""configuration":{"delta.columnMapping.mode":"$mode",""" +
      s""""delta.columnMapping.maxColumnId":"4"}}}"""

  private def dataFile(dir: String, name: String,
      rows: Seq[(Long, String)]): Unit = {
    val s = spark
    import s.implicits._
    // write with PHYSICAL column names, nested physical too
    val df = rows.toDF("a", "b")
      .select(col("a").as("col-aaa"),
        struct(col("b").as("col-bbb")).as("col-ccc"))
    val tmp = s"$dir/__tmp"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val part = fs.listStatus(new Path(tmp)).map(_.getPath)
      .find(_.getName.startsWith("part-")).get
    fs.rename(part, new Path(dir, name))
    fs.delete(new Path(tmp), true)
  }

  test("name-mode mapping: logical names out, nested rename, physical " +
      "partitionValues keys; v2 protocol now reads") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cmap").toString
    try {
      dataFile(dir, "f1.parquet", Seq((1L, "one"), (2L, "two")))
      dataFile(dir, "f2.parquet", Seq((3L, "three")))
      java.nio.file.Files.createDirectories(
        java.nio.file.Path.of(dir, "_delta_log"))
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(dir, "_delta_log", f"${0L}%020d.json"),
        Seq(
          """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
          metaLine("name"),
          """{"add":{"path":"f1.parquet","partitionValues":{"col-ppp":"x"},"size":1,"modificationTime":1,"dataChange":true}}""",
          """{"add":{"path":"f2.parquet","partitionValues":{"col-ppp":"y"},"size":1,"modificationTime":1,"dataChange":true}}"""
        ).mkString("\n") + "\n")
      val df = graft.sources.DeltaLakeSource.read(spark, dir)
      assert(df.columns.toSeq == Seq("id", "info", "p"),
        s"logical names expected, got ${df.columns.toSeq}")
      assert(df.schema("info").dataType.asInstanceOf[
        org.apache.spark.sql.types.StructType].fieldNames.toSeq ==
        Seq("label"), "nested field must rename to its logical name")
      val rows = df.collect()
        .map(r => (r.getLong(0), r.getStruct(1).getString(0),
          r.getString(2))).sortBy(_._1).toSeq
      assert(rows == Seq((1L, "one", "x"), (2L, "two", "x"),
        (3L, "three", "y")))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("v3 readerFeatures [columnMapping, deletionVectors] compose: a " +
      "mapped table with a DV masks the right rows") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cmap_dv").toString
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    try {
      dataFile(dir, "f1.parquet",
        (0L until 6L).map(i => (i, s"v$i")))
      val data = graft.sources.DeltaDeletionVectors
        .serializeBitmaps(Seq(1L, 4L))
      val uuid = java.util.UUID.randomUUID()
      val off = graft.sources.DeltaDeletionVectors.writeDvFile(fs,
        new Path(dir, s"deletion_vector_$uuid.bin"), Seq(data)).head
      val enc = graft.sources.DeltaDeletionVectors.z85EncodeUuid(uuid)
      java.nio.file.Files.createDirectories(
        java.nio.file.Path.of(dir, "_delta_log"))
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(dir, "_delta_log", f"${0L}%020d.json"),
        Seq(
          """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
            """"readerFeatures":["columnMapping","deletionVectors"],""" +
            """"writerFeatures":["columnMapping","deletionVectors"]}}""",
          metaLine("name"),
          s"""{"add":{"path":"f1.parquet","partitionValues":{"col-ppp":"z"},""" +
            s""""size":1,"modificationTime":1,"dataChange":true,""" +
            s""""deletionVector":{"storageType":"u","pathOrInlineDv":"$enc",""" +
            s""""offset":$off,"sizeInBytes":${data.length},"cardinality":2}}}"""
        ).mkString("\n") + "\n")
      val ids = graft.sources.DeltaLakeSource.read(spark, dir)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(0L, 2L, 3L, 5L),
        s"rows 1 and 4 must be DV-masked on the mapped table, got $ids")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("column-mapped WRITES (round 14): appends stage physical names " +
      "and physical partitionValues keys; update and both delete lanes " +
      "compose on the mapped table") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cmap_wr").toString
    try {
      dataFile(s"$dir/seed", "ignored.parquet", Seq((0L, "zero")))
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir, "seed"))
      java.nio.file.Files.createDirectories(
        java.nio.file.Path.of(dir, "_delta_log"))
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(dir, "_delta_log", f"${0L}%020d.json"),
        Seq("""{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
          metaLine("name")).mkString("\n") + "\n")
      // APPEND with logical names — the staged parquet must store
      // physical columns, partitionValues must key by col-ppp
      val df = Seq((1L, "one", "x"), (2L, "two", "x"), (3L, "three", "y"))
        .toDF("id", "label", "p")
        .select(col("id"),
          struct(col("label").as("label")).as("info"), col("p"))
      val v1 = graft.sources.DeltaLakeSink.append(df, dir,
        partitionBy = Seq("p"))
      assert(v1 == 1L)
      val commit1 = java.nio.file.Files.readString(
        java.nio.file.Path.of(dir, "_delta_log", f"${1L}%020d.json"))
      assert(commit1.contains("\"col-ppp\""),
        "partitionValues must key by the PHYSICAL partition name")
      val stagedFile = new java.io.File(dir).listFiles
        .map(_.getName).find(_.endsWith(".parquet")).get
      val physCols = spark.read.parquet(s"$dir/$stagedFile").columns.toSet
      assert(physCols == Set("col-aaa", "col-ccc"),
        s"data files must store physical names, got $physCols")
      val back = graft.sources.DeltaLakeSource.read(spark, dir)
      assert(back.columns.toSeq == Seq("id", "info", "p"))
      assert(back.count() == 3L)
      // UPDATE through the logical name
      val (v2, n2) = graft.sources.DeltaLakeSink.update(spark, dir,
        Seq("info" -> struct(upper(col("info.label")).as("label"))),
        col("id") === 2L)
      assert(v2 == 2L && n2 == 1L)
      val lbl = graft.sources.DeltaLakeSource.read(spark, dir)
        .where(col("id") === 2L).select("info.label")
        .as[String].collect().head
      assert(lbl == "TWO")
      // lightweight DV delete, then CoW delete, both on the mapped table
      val (v3, n3) = graft.sources.DeltaLakeSink.deleteLightweight(
        spark, dir, col("id") === 1L)
      assert(v3 == 3L && n3 == 1L)
      val (v4, n4) = graft.sources.DeltaLakeSink.delete(
        spark, dir, col("id") === 3L)
      assert(v4 == 4L && n4 == 1L)
      val ids = graft.sources.DeltaLakeSource.read(spark, dir)
        .select("id").as[Long].collect().toSeq
      assert(ids == Seq(2L))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("mapping mode without physicalName metadata is loud; unknown " +
      "mode is loud") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_cmap_bad").toString
    try {
      dataFile(dir, "f1.parquet", Seq((1L, "x")))
      val bare =
        """{"type":"struct","fields":[{"name":"id","type":"long",""" +
          """"nullable":true,"metadata":{}}]}"""
      java.nio.file.Files.createDirectories(
        java.nio.file.Path.of(dir, "_delta_log"))
      java.nio.file.Files.writeString(
        java.nio.file.Path.of(dir, "_delta_log", f"${0L}%020d.json"),
        Seq(
          """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
          s"""{"metaData":{"id":"cm2","format":{"provider":"parquet"},""" +
            s""""schemaString":"${jsonEsc(bare)}","partitionColumns":[],""" +
            s""""configuration":{"delta.columnMapping.mode":"name"}}}""",
          """{"add":{"path":"f1.parquet","partitionValues":{},"size":1,"modificationTime":1,"dataChange":true}}"""
        ).mkString("\n") + "\n")
      val e = intercept[IllegalArgumentException] {
        graft.sources.DeltaLakeSource.read(spark, dir).collect()
      }
      assert(e.getMessage.contains("physicalName"))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }
}
