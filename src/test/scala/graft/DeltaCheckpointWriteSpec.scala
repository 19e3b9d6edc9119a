package graft

import org.apache.hadoop.fs.Path

/** Checkpoint WRITING + overwrite commits (round 14 — pulled forward
  * from the round-15 candidates): every checkpointInterval commits the
  * sink emits a single-part %020d.checkpoint.parquet + _last_checkpoint
  * pointer that this repo's own reader (and the protocol) can seed
  * from; overwrite replaces the table atomically and refuses on any
  * racing commit. */
class DeltaCheckpointWriteSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._
  import graft.sources.{DeltaLakeSink, DeltaLakeSource}

  test("checkpointInterval: the v1 commit writes a checkpoint + " +
      "pointer; the table reads from it after the JSON commits are gone") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ckw").toString + "/t"
    try {
      DeltaLakeSink.append(Seq((1L, "a")).toDF("id", "name"), dir,
        checkpointInterval = 2)
      DeltaLakeSink.append(Seq((2L, "b")).toDF("id", "name"), dir,
        checkpointInterval = 2) // (1+1) % 2 == 0 → checkpoint at v1
      DeltaLakeSink.append(Seq((3L, "c")).toDF("id", "name"), dir,
        checkpointInterval = 2)
      val log = java.nio.file.Path.of(dir, "_delta_log")
      assert(java.nio.file.Files.exists(
        log.resolve(f"${1L}%020d.checkpoint.parquet")),
        "checkpoint parquet must exist at v1")
      val lc = java.nio.file.Files.readString(
        log.resolve("_last_checkpoint"))
      assert(lc.contains("\"version\":1"), s"pointer: $lc")
      // drop the pre-checkpoint JSON commits — the snapshot must carry
      java.nio.file.Files.delete(log.resolve(f"${0L}%020d.json"))
      java.nio.file.Files.delete(log.resolve(f"${1L}%020d.json"))
      val ids = DeltaLakeSource.read(spark, dir)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L),
        s"checkpoint + v2 replay must reconstruct everything, got $ids")
      assert(DeltaLakeSource.read(spark, dir, versionAsOf = Some(1L))
        .count() == 2L, "time travel to the checkpoint version")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)
  }

  test("v2 checkpoint write (round 15): UUID manifest + multi-sidecar " +
      "layout reads back identically after the JSON log vacuums; " +
      "checkpointMetadata + pointer integrity hold; DVs survive") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ckv2").toString + "/t"
    val oldMax = DeltaLakeSink.SidecarMaxActions
    try {
      // several files so the shrunken sidecar cap forces >1 sidecar
      DeltaLakeSink.append((1L to 40L).map(i => (i, s"n$i"))
        .toDF("id", "name").repartition(5), dir, checkpointInterval = 0)
      DeltaLakeSink.append(Seq((41L, "x")).toDF("id", "name"), dir,
        checkpointInterval = 0)
      // round 16: a v2 checkpoint needs the v2Checkpoint reader feature
      // in the protocol (the ADVICE gate) — without it the write must
      // refuse loudly...
      val refused = intercept[IllegalArgumentException] {
        DeltaLakeSink.writeCheckpoint(spark, dir, 1L, policy = Some("v2"))
      }
      assert(refused.getMessage.contains("v2Checkpoint"))
      // ...and setTableProperties(checkpointPolicy=v2) upgrades the
      // protocol in the same commit it sets the property
      DeltaLakeSink.setTableProperties(spark, dir,
        Map("delta.checkpointPolicy" -> "v2"))
      // a DV so the sidecar add rows carry the descriptor through
      val (v2, _) = DeltaLakeSink.deleteLightweight(spark, dir,
        org.apache.spark.sql.functions.col("id") % 10 === 0,
        checkpointInterval = 0)
      DeltaLakeSink.SidecarMaxActions = 3
      DeltaLakeSink.writeCheckpoint(spark, dir, v2, policy = Some("v2"))
      val log = java.nio.file.Path.of(dir, "_delta_log")
      val names = new java.io.File(log.toString).listFiles.map(_.getName)
      val manifest = names.filter(_.matches(
        f"$v2%020d\\.checkpoint\\.[0-9a-fA-F-]{36}\\.parquet"))
      assert(manifest.length == 1, s"expected one v2 manifest: " +
        names.mkString(", "))
      val sidecars = Option(new java.io.File(log.resolve("_sidecars")
        .toString).listFiles).map(_.map(_.getName)
        .filter(_.endsWith(".parquet")).toSeq).getOrElse(Nil)
      assert(sidecars.size > 1,
        s"the 3-action cap must force multiple sidecars, got $sidecars")
      // the manifest itself holds NO adds — they live in the sidecars
      val mdf = spark.read.parquet(log.resolve(manifest.head).toString)
      assert(!mdf.columns.contains("add"))
      assert(mdf.where(org.apache.spark.sql.functions
        .col("checkpointMetadata").isNotNull).count() == 1L)
      val expect = (1L to 41L).filterNot(_ % 10 == 0)
      // vacuum EVERY JSON commit: the v2 manifest + sidecars must
      // reconstruct the whole state, deletion vectors included
      names.filter(_.endsWith(".json")).foreach(n =>
        java.nio.file.Files.delete(log.resolve(n)))
      val ids = DeltaLakeSource.read(spark, dir)
        .select("id").as[Long].collect().sorted.toSeq
      assert(ids == expect,
        s"v2 checkpoint replay after vacuum: got ${ids.take(8)}...")
      // and a fresh append on top of the vacuumed v2 log still commits
      DeltaLakeSink.append(Seq((99L, "z")).toDF("id", "name"), dir,
        checkpointInterval = 0)
      assert(DeltaLakeSource.read(spark, dir).count() == expect.size + 1L)
    } finally {
      DeltaLakeSink.SidecarMaxActions = oldMax
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(dir).getParentFile)
    }
  }

  test("appending to a fully-vacuumed log (checkpoint only, no JSON " +
      "commits) claims the version ABOVE the checkpoint — never one " +
      "readers would skip") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ckvac").toString + "/t"
    try {
      DeltaLakeSink.append(Seq((1L, "a")).toDF("id", "name"), dir,
        checkpointInterval = 1) // checkpoint at v0
      val log = java.nio.file.Path.of(dir, "_delta_log")
      java.nio.file.Files.delete(log.resolve(f"${0L}%020d.json"))
      val v = DeltaLakeSink.append(Seq((2L, "b")).toDF("id", "name"), dir)
      assert(v == 1L, s"the append must land above the checkpoint, got $v")
      val ids = DeltaLakeSource.read(spark, dir)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(1L, 2L),
        s"both the checkpointed row and the append must read, got $ids")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)
  }

  test("overwrite replaces the active set atomically; a racing commit " +
      "is a loud conflict, never a half-replace") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ovw").toString + "/t"
    try {
      DeltaLakeSink.append(
        Seq((1L, "old"), (2L, "old")).toDF("id", "name"), dir)
      val v = DeltaLakeSink.overwrite(
        Seq((10L, "new")).toDF("id", "name"), dir)
      assert(v == 1L)
      val now = DeltaLakeSource.read(spark, dir)
        .collect().map(_.getLong(0)).toSeq
      assert(now == Seq(10L), s"overwrite must replace, got $now")
      assert(DeltaLakeSource.read(spark, dir, versionAsOf = Some(0L))
        .count() == 2L, "time travel still sees the pre-overwrite rows")
      // racing blind append between log read and claim → loud for
      // overwrite (the captured remove set is stale)
      DeltaLakeSink.commitFailpoint = () =>
        java.nio.file.Files.writeString(java.nio.file.Path.of(
          dir, "_delta_log", f"${2L}%020d.json"),
          """{"add":{"path":"ghost.parquet","partitionValues":{},""" +
            """"size":1,"modificationTime":1,"dataChange":true}}""" + "\n")
      val e = try intercept[IllegalStateException] {
        DeltaLakeSink.overwrite(Seq((20L, "x")).toDF("id", "name"), dir)
      } finally DeltaLakeSink.commitFailpoint = () => ()
      assert(e.getMessage.contains("stale"))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)
  }

  test("a written checkpoint preserves deletion vectors: the masked " +
      "rows stay absent when the snapshot reads from the checkpoint") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ckdv").toString
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    try {
      // hand-built DV table (as in DeltaDvReadSpec): 6 rows, 2 masked
      val tmp = s"$dir/__tmp"
      (0L until 6L).map(i => (i, s"n$i")).toDF("id", "name")
        .repartition(1).sortWithinPartitions("id")
        .write.mode("overwrite").parquet(tmp)
      val part = fs.listStatus(new Path(tmp)).map(_.getPath)
        .find(_.getName.startsWith("part-")).get
      fs.rename(part, new Path(dir, "d1.parquet"))
      fs.delete(new Path(tmp), true)
      val data = graft.sources.DeltaDeletionVectors
        .serializeBitmaps(Seq(1L, 4L))
      val uuid = java.util.UUID.randomUUID()
      val off = graft.sources.DeltaDeletionVectors.writeDvFile(fs,
        new Path(dir, s"deletion_vector_$uuid.bin"), Seq(data)).head
      val enc = graft.sources.DeltaDeletionVectors.z85EncodeUuid(uuid)
      val schemaString = ("""{"type":"struct","fields":[""" +
        """{"name":"id","type":"long","nullable":true,"metadata":{}},""" +
        """{"name":"name","type":"string","nullable":true,"metadata":{}}]}""")
        .replace("\"", "\\\"")
      java.nio.file.Files.createDirectories(
        java.nio.file.Path.of(dir, "_delta_log"))
      java.nio.file.Files.writeString(java.nio.file.Path.of(
        dir, "_delta_log", f"${0L}%020d.json"),
        Seq(
          """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
            """"readerFeatures":["deletionVectors"],""" +
            """"writerFeatures":["deletionVectors"]}}""",
          s"""{"metaData":{"id":"dv","format":{"provider":"parquet"},""" +
            s""""schemaString":"$schemaString","partitionColumns":[],""" +
            s""""configuration":{}}}""",
          s"""{"add":{"path":"d1.parquet","partitionValues":{},"size":1,""" +
            s""""modificationTime":1,"dataChange":true,"deletionVector":""" +
            s"""{"storageType":"u","pathOrInlineDv":"$enc","offset":$off,""" +
            s""""sizeInBytes":${data.length},"cardinality":2}}}"""
        ).mkString("\n") + "\n")
      DeltaLakeSink.writeCheckpoint(spark, dir, 0L)
      java.nio.file.Files.delete(java.nio.file.Path.of(
        dir, "_delta_log", f"${0L}%020d.json"))
      val ids = DeltaLakeSource.read(spark, dir)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(ids == Seq(0L, 2L, 3L, 5L),
        s"DV must survive the checkpoint round trip, got $ids")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }
}
