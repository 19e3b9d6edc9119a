package graft

/** Iceberg APPEND (round 14 — write-side counterpart of IcebergSource,
  * Hadoop-catalog commit protocol): create + append + read through
  * this repo's own reader, snapshot/timestamp time travel across the
  * written snapshots, loud gates, and the version-claim conflict. */
class IcebergSinkSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._
  import graft.sources.{IcebergSink, IcebergSource}

  test("create + append roundtrip with snapshot and timestamp time " +
      "travel; version-hint follows") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_icesink").toString + "/t"
    try {
      val s1 = IcebergSink.append(
        Seq((1L, "a"), (2L, "b")).toDF("id", "name"), dir)
      Thread.sleep(5) // distinct timestamp-ms for the travel pin
      val s2 = IcebergSink.append(Seq((3L, "c")).toDF("id", "name"), dir)
      assert(s1 != s2)
      val now = IcebergSource.read(spark, dir)
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(now == Seq(1L, 2L, 3L), s"got $now")
      assert(IcebergSource.read(spark, dir, snapshotId = Some(s1))
        .count() == 2L, "snapshot time travel to the creation")
      val hint = java.nio.file.Files.readString(
        java.nio.file.Path.of(dir, "metadata", "version-hint.text"))
      assert(hint.trim == "2")
      // the dialect lane reads the written table too
      assert(graft.sql.ClickHouseSql.sql(spark,
        s"SELECT count() AS n FROM iceberg('$dir')")
        .collect().head.getLong(0) == 3L)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)
  }

  test("unmodeled top-level metadata fields carry through commits " +
      "VERBATIM (partition-specs, last-column-id, properties ...)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_icesink4").toString + "/t"
    try {
      IcebergSink.append(Seq((1L, "a")).toDF("id", "name"), dir)
      // splice fields this writer does not model into the live metadata
      // (what a real engine's commit would have written)
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val mdir = java.nio.file.Path.of(dir, "metadata")
      val v1 = mdir.resolve("v1.metadata.json")
      val node = mapper.readTree(java.nio.file.Files.readString(v1))
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      node.put("last-column-id", 2)
      node.putArray("partition-specs").addObject()
        .put("spec-id", 0).putArray("fields")
      node.putObject("properties").put("owner", "someone-else")
      java.nio.file.Files.writeString(v1, mapper.writeValueAsString(node))
      // the splice bypassed Hadoop's LocalFileSystem — drop the now-
      // stale checksum sidecar or the next read fails on it
      java.nio.file.Files.deleteIfExists(
        mdir.resolve(".v1.metadata.json.crc"))
      // a new commit must carry all three through verbatim (the r14
      // string-template writer dropped them — r14 ADVICE)
      IcebergSink.append(Seq((2L, "b")).toDF("id", "name"), dir)
      val v2 = mapper.readTree(java.nio.file.Files.readString(
        mdir.resolve("v2.metadata.json")))
      assert(v2.get("last-column-id").asInt == 2)
      assert(v2.get("partition-specs") != null &&
        v2.get("partition-specs").get(0).get("spec-id").asInt == 0)
      assert(v2.get("properties").get("owner").asText == "someone-else")
      assert(IcebergSource.read(spark, dir).count() == 2L)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)
  }

  test("overwrite replaces the current state while older snapshots " +
      "stay time-travelable") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_icesink3").toString + "/t"
    try {
      val s1 = IcebergSink.append(
        Seq((1L, "a"), (2L, "b")).toDF("id", "name"), dir)
      IcebergSink.overwrite(Seq((9L, "z")).toDF("id", "name"), dir)
      val now = IcebergSource.read(spark, dir)
        .collect().map(_.getLong(0)).toSeq
      assert(now == Seq(9L), s"overwrite must replace, got $now")
      assert(IcebergSource.read(spark, dir, snapshotId = Some(s1))
        .count() == 2L, "the pre-overwrite snapshot still reads")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)
  }

  test("loud gates: schema mismatch and a concurrent version claim") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_icesink2").toString + "/t"
    try {
      IcebergSink.append(Seq((1L, "a")).toDF("id", "name"), dir)
      val e1 = intercept[IllegalArgumentException] {
        IcebergSink.append(Seq((1L, 2L)).toDF("id", "other"), dir)
      }
      assert(e1.getMessage.contains("schema mismatch"))
      // racing committer claims v2 between the log read and the claim
      IcebergSink.commitFailpoint = () =>
        java.nio.file.Files.writeString(java.nio.file.Path.of(
          dir, "metadata", "v2.metadata.json"), "{}")
      val e2 = try intercept[IllegalStateException] {
        IcebergSink.append(Seq((9L, "z")).toDF("id", "name"), dir)
      } finally IcebergSink.commitFailpoint = () => ()
      assert(e2.getMessage.contains("concurrently"))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)
  }
}
