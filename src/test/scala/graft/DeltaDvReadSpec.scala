package graft

import org.apache.hadoop.fs.Path

// checkpoint action rows (top-level for the Product encoder)
case class V2Sidecar(path: String)
case class V2CkMeta(version: Long)
case class V2CkRow(add: Option[DvCkAdd], metaData: Option[DvCkMeta],
    protocol: Option[DvCkProt], checkpointMetadata: Option[V2CkMeta],
    sidecar: Option[V2Sidecar])
case class SidecarRow(add: Option[DvCkAdd], remove: Option[DvCkAdd])
case class DvCkAdd(path: String)
case class DvCkMeta(schemaString: String, partitionColumns: Seq[String])
case class DvCkProt(minReaderVersion: Int)
case class DvCkRow(add: Option[DvCkAdd], remove: Option[DvCkAdd],
    metaData: Option[DvCkMeta], protocol: Option[DvCkProt])

/** DeltaLakeSource × deletion vectors: masked rows are verifiably
  * absent, the protocol gate transition (v3 + deletionVectors now
  * READS; v2 / unknown v3 features still refuse), and the round-13
  * wrong-#2 hardening (loud action cap on checkpoint collect). */
class DeltaDvReadSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._
  import graft.sources.{DeltaDeletionVectors, DeltaLakeSource}

  private val schemaString =
    """{"type":"struct","fields":[
      |{"name":"id","type":"long","nullable":true,"metadata":{}},
      |{"name":"name","type":"string","nullable":true,"metadata":{}}]}"""
      .stripMargin.replace("\n", "")

  private def jsonEsc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def metaLine: String =
    s"""{"metaData":{"id":"t1","format":{"provider":"parquet"},""" +
      s""""schemaString":"${jsonEsc(schemaString)}",""" +
      s""""partitionColumns":[],"configuration":{}}}"""

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

  private def writeCommit(dir: String, version: Long,
      lines: Seq[String]): Unit = {
    val p = java.nio.file.Path.of(dir, "_delta_log",
      f"$version%020d.json")
    java.nio.file.Files.createDirectories(p.getParent)
    java.nio.file.Files.writeString(p, lines.mkString("\n") + "\n")
  }

  private def protocolV3: String =
    """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
      """"readerFeatures":["deletionVectors"],""" +
      """"writerFeatures":["deletionVectors"]}}"""

  private def addLine(path: String, dv: Option[String]): String = {
    val dvPart = dv.map(d => s""","deletionVector":$d""").getOrElse("")
    s"""{"add":{"path":"$path","partitionValues":{},"size":1,""" +
      s""""modificationTime":1,"dataChange":true$dvPart}}"""
  }

  // file d1 rows are written in id order, so row index == position
  private val d1Rows = (0L until 10L).map(i => (i, s"n$i"))
  private val d2Rows = (100L until 105L).map(i => (i, s"n$i"))

  test("a 'u'-stored deletion vector masks exactly its row indexes") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dv_u").toString
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    try {
      dataFile(dir, "d1.parquet", d1Rows)
      dataFile(dir, "d2.parquet", d2Rows)
      // delete rows at positions 2, 3, 7 of d1
      val data = DeltaDeletionVectors.serializeBitmaps(Seq(2L, 3L, 7L))
      val uuid = java.util.UUID.randomUUID()
      val off = DeltaDeletionVectors.writeDvFile(fs,
        new Path(dir, s"deletion_vector_$uuid.bin"), Seq(data)).head
      val enc = DeltaDeletionVectors.z85EncodeUuid(uuid)
      val dvJson = s"""{"storageType":"u","pathOrInlineDv":"$enc",""" +
        s""""offset":$off,"sizeInBytes":${data.length},"cardinality":3}"""
      writeCommit(dir, 0L, Seq(protocolV3, metaLine,
        addLine("d1.parquet", Some(dvJson)),
        addLine("d2.parquet", None)))
      val ids = DeltaLakeSource.read(spark, dir)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == (Seq(0L, 1L, 4L, 5L, 6L, 8L, 9L) ++
        (100L until 105L)),
        "positions 2/3/7 of d1 must be absent; d2 untouched")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("an inline ('i') deletion vector masks rows; cardinality " +
      "mismatch is loud") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dv_i").toString
    try {
      dataFile(dir, "d1.parquet", d1Rows)
      val data0 = DeltaDeletionVectors.serializeBitmaps(Seq(0L, 9L))
      // pad to a multiple of 4 for Z85 (the deserializer reads
      // structurally and ignores trailing padding)
      val data = data0 ++ Array.fill((4 - data0.length % 4) % 4)(0.toByte)
      val enc = DeltaDeletionVectors.z85Encode(data)
      def dvJson(card: Int) =
        s"""{"storageType":"i","pathOrInlineDv":"$enc",""" +
          s""""sizeInBytes":${data.length},"cardinality":$card}"""
      writeCommit(dir, 0L, Seq(protocolV3, metaLine,
        addLine("d1.parquet", Some(dvJson(2)))))
      val ids = DeltaLakeSource.read(spark, dir)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == (1L to 8L), "first and last rows must be masked")
      // same table, lying cardinality → loud
      writeCommit(dir, 1L, Seq(addLine("d1.parquet", Some(dvJson(5)))))
      val e = intercept[IllegalArgumentException] {
        DeltaLakeSource.read(spark, dir).collect()
      }
      assert(e.getMessage.contains("cardinality"))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("protocol transition pins: v3+deletionVectors reads, " +
      "v3+unknown feature refuses, v2 (mode none) reads") {
    // (round 14 later in the same round: columnMapping became a
    // SUPPORTED reader feature — DeltaColumnMappingSpec pins it; the
    // refusal pin here uses a genuinely unimplemented feature)
    val dir = java.nio.file.Files.createTempDirectory("graft_dv_p").toString
    try {
      dataFile(dir, "d1.parquet", d1Rows)
      writeCommit(dir, 0L, Seq(
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
          """"readerFeatures":["deletionVectors","collations"]}}""",
        metaLine, addLine("d1.parquet", None)))
      val e = intercept[IllegalArgumentException] {
        DeltaLakeSource.read(spark, dir)
      }
      assert(e.getMessage.contains("collations"))
      // v2 with no columnMapping.mode set = mode none → plain read
      writeCommit(dir, 0L, Seq(
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        metaLine, addLine("d1.parquet", None)))
      assert(DeltaLakeSource.read(spark, dir).count() == 10L)
      // v3 with ONLY deletionVectors (and no actual DV) reads fine
      writeCommit(dir, 0L, Seq(protocolV3, metaLine,
        addLine("d1.parquet", None)))
      assert(DeltaLakeSource.read(spark, dir).count() == 10L)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("multi-part checkpoints read as one scan; an incomplete part " +
      "set refuses loudly") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dv_mp").toString
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    try {
      dataFile(dir, "f0.parquet", Seq((1L, "a")))
      dataFile(dir, "f1.parquet", Seq((2L, "b")))
      java.nio.file.Files.createDirectories(
        java.nio.file.Path.of(dir, "_delta_log"))
      def ckPart(rows: Seq[DvCkRow], part: Int, total: Int): Unit = {
        val tmp = s"$dir/__ckp"
        rows.toDS().coalesce(1).write.mode("overwrite").parquet(tmp)
        val p = fs.listStatus(new Path(tmp)).map(_.getPath)
          .find(_.getName.startsWith("part-")).get
        fs.rename(p, new Path(s"$dir/_delta_log",
          f"${0L}%020d.checkpoint.$part%010d.$total%010d.parquet"))
        fs.delete(new Path(tmp), true)
      }
      ckPart(Seq(
        DvCkRow(None, None, Some(DvCkMeta(schemaString, Seq.empty)),
          Some(DvCkProt(1))),
        DvCkRow(Some(DvCkAdd("f0.parquet")), None, None, None)), 1, 2)
      ckPart(Seq(
        DvCkRow(Some(DvCkAdd("f1.parquet")), None, None, None)), 2, 2)
      val ids = DeltaLakeSource.read(spark, dir)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L),
        s"both checkpoint parts must contribute, got $ids")
      // drop one part → incomplete set is loud
      fs.delete(new Path(s"$dir/_delta_log",
        f"${0L}%020d.checkpoint.${2}%010d.${2}%010d.parquet"), false)
      val e = intercept[IllegalArgumentException] {
        DeltaLakeSource.read(spark, dir)
      }
      assert(e.getMessage.contains("incomplete"))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("v2 checkpoints: a UUID-named manifest with sidecar files " +
      "reconstructs the snapshot; checkpointMetadata version mismatch " +
      "is loud") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_dv_v2ck").toString
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    try {
      dataFile(dir, "f0.parquet", Seq((1L, "a")))
      dataFile(dir, "f1.parquet", Seq((2L, "b")))
      dataFile(dir, "f2.parquet", Seq((3L, "c")))
      java.nio.file.Files.createDirectories(
        java.nio.file.Path.of(dir, "_delta_log", "_sidecars"))
      def onePart(df: org.apache.spark.sql.DataFrame, dst: Path): Unit = {
        val tmp = s"$dir/__v2tmp"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = fs.listStatus(new Path(tmp)).map(_.getPath)
          .find(_.getName.startsWith("part-")).get
        fs.delete(dst, false) // rename silently no-ops onto an existing file
        fs.rename(part, dst)
        fs.delete(new Path(tmp), true)
      }
      // sidecar 1: adds f0 + f1 (and a remove tombstone for f1);
      // sidecar 2: adds f2
      onePart(Seq(
        SidecarRow(Some(DvCkAdd("f0.parquet")), None),
        SidecarRow(Some(DvCkAdd("f1.parquet")), None),
        SidecarRow(None, Some(DvCkAdd("f1.parquet")))).toDS().toDF(),
        new Path(s"$dir/_delta_log/_sidecars", "sc1.parquet"))
      onePart(Seq(
        SidecarRow(Some(DvCkAdd("f2.parquet")), None)).toDS().toDF(),
        new Path(s"$dir/_delta_log/_sidecars", "sc2.parquet"))
      val uuid = java.util.UUID.randomUUID()
      def manifest(ckVersion: Long): Unit = onePart(Seq(
        V2CkRow(None, Some(DvCkMeta(schemaString, Seq.empty)),
          Some(DvCkProt(1)), None, None),
        V2CkRow(None, None, None, Some(V2CkMeta(ckVersion)), None),
        V2CkRow(None, None, None, None, Some(V2Sidecar("sc1.parquet"))),
        V2CkRow(None, None, None, None, Some(V2Sidecar("sc2.parquet"))))
        .toDS().toDF(),
        new Path(s"$dir/_delta_log",
          f"${0L}%020d.checkpoint.$uuid.parquet"))
      manifest(0L)
      val ids = DeltaLakeSource.read(spark, dir)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 3L),
        s"sidecar adds minus the tombstone = f0 + f2, got $ids")
      // a manifest claiming the wrong version is corrupt — loud
      manifest(7L)
      val e = intercept[IllegalArgumentException] {
        DeltaLakeSource.read(spark, dir)
      }
      assert(e.getMessage.contains("checkpointMetadata"))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("checkpoint hardening: live actions above the cap refuse " +
      "loudly; under the cap the replay is unchanged") {
    val dir = java.nio.file.Files.createTempDirectory("graft_dv_cap").toString
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    try {
      val names = (0 until 5).map(i => s"f$i.parquet")
      names.zipWithIndex.foreach { case (n, i) =>
        dataFile(dir, n, Seq((i.toLong, s"n$i")))
      }
      writeCommit(dir, 0L, Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        metaLine) ++ names.map(n => addLine(n, None)))
      // checkpoint at v0 carrying all five adds + one remove tombstone
      val ck = Seq(
        DvCkRow(None, None, Some(DvCkMeta(schemaString, Seq.empty)),
          Some(DvCkProt(1)))) ++
        names.map(n => DvCkRow(Some(DvCkAdd(n)), None, None, None)) :+
        DvCkRow(None, Some(DvCkAdd("f4.parquet")), None, None)
      val tmp = s"$dir/__ck"
      ck.toDS().coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = fs.listStatus(new Path(tmp)).map(_.getPath)
        .find(_.getName.startsWith("part-")).get
      fs.rename(part,
        new Path(s"$dir/_delta_log", f"${0L}%020d.checkpoint.parquet"))
      fs.delete(new Path(tmp), true)
      fs.delete(new Path(s"$dir/_delta_log", f"${0L}%020d.json"), false)
      // the remove reconciles DISTRIBUTED: 4 live files survive
      val ids = DeltaLakeSource.read(spark, dir)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(0L, 1L, 2L, 3L))
      val e = intercept[IllegalArgumentException] {
        DeltaLakeSource.read(spark, dir, maxCollectedActions = 3L)
      }
      assert(e.getMessage.contains("driver cap"))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }
}
