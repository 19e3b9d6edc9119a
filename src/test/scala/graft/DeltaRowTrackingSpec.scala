package graft

import org.apache.spark.sql.functions.col

/** Delta ROW TRACKING (round 15 — the final r14 "Delta protocol
  * residue" item; PROTOCOL.md "Row Tracking" + "Domain Metadata"):
  * appends assign fresh base row ids above the table's
  * rowIdHighWaterMark (domain `delta.rowTracking`) and stamp
  * defaultRowCommitVersion; the commit bumps the watermark domain;
  * DV deletes re-add files VERBATIM with their ids echoed; operations
  * that MOVE rows (CoW update/delete, compaction) refuse loudly; and
  * the watermark + per-add ids survive a checkpoint + vacuum. */
class DeltaRowTrackingSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._
  import graft.sources.{DeltaLakeSink, DeltaLakeSource}

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def commitNodes(dir: String, v: Long) =
    java.nio.file.Files.readString(java.nio.file.Path.of(
      dir, "_delta_log", f"$v%020d.json"))
      .split("\n").map(_.trim).filter(_.nonEmpty).toSeq
      .map(mapper.readTree)

  /** v1: the upgrade a real engine commits when enabling row tracking —
    * minWriter 7 with rowTracking+domainMetadata and a seeded
    * watermark. */
  private def spliceEnable(dir: String, watermark: Long): Unit = {
    val proto = mapper.createObjectNode()
    proto.put("minReaderVersion", 1)
    proto.put("minWriterVersion", 7)
    val wf = proto.putArray("writerFeatures")
    Seq("appendOnly", "invariants", "rowTracking", "domainMetadata")
      .foreach(wf.add)
    val protoLine = mapper.createObjectNode()
    protoLine.set[com.fasterxml.jackson.databind.JsonNode](
      "protocol", proto)
    val dm = mapper.createObjectNode()
    dm.put("domain", "delta.rowTracking")
    dm.put("configuration", s"""{"rowIdHighWaterMark":$watermark}""")
    dm.put("removed", false)
    val dmLine = mapper.createObjectNode()
    dmLine.set[com.fasterxml.jackson.databind.JsonNode](
      "domainMetadata", dm)
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(dir, "_delta_log", f"${1L}%020d.json"),
      mapper.writeValueAsString(protoLine) + "\n" +
        mapper.writeValueAsString(dmLine) + "\n")
  }

  test("appends assign fresh cumulative base row ids, bump the " +
      "watermark, DV deletes echo ids, movers refuse, checkpoint + " +
      "vacuum keeps everything") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_rt").toString + "/t"
    try {
      DeltaLakeSink.append(spark.range(1, 4).selectExpr("id"), dir,
        checkpointInterval = 0) // v0, pre-enablement (no ids)
      spliceEnable(dir, watermark = 41L)
      // v2: a 3-file append — bases are CUMULATIVE from the watermark
      DeltaLakeSink.append(
        spark.range(10, 22).selectExpr("id").repartition(3), dir,
        checkpointInterval = 0)
      val adds2 = commitNodes(dir, 2L).flatMap(n => Option(n.get("add")))
      assert(adds2.nonEmpty)
      val bases = adds2.map(_.get("baseRowId").asLong).sorted
      assert(bases.head == 42L, s"first base must be watermark+1: $bases")
      assert(adds2.forall(
        _.get("defaultRowCommitVersion").asLong == 2L))
      val dm2 = commitNodes(dir, 2L)
        .flatMap(n => Option(n.get("domainMetadata"))).head
      val wm2 = mapper.readTree(dm2.get("configuration").asText)
        .get("rowIdHighWaterMark").asLong
      assert(wm2 == 41L + 12L, s"watermark must bump by the rows: $wm2")
      // v3: the NEXT append continues above the new watermark
      DeltaLakeSink.append(spark.range(30, 33).selectExpr("id"), dir,
        checkpointInterval = 0)
      val bases3 = commitNodes(dir, 3L)
        .flatMap(n => Option(n.get("add")))
        .map(_.get("baseRowId").asLong)
      assert(bases3.min == wm2 + 1, s"got $bases3 (watermark $wm2)")
      // movers refuse loudly
      val eU = intercept[IllegalArgumentException] {
        DeltaLakeSink.update(spark, dir, Seq("id" -> (col("id") + 1)),
          col("id") === 10L)
      }
      assert(eU.getMessage.contains("row ids"))
      val eC = intercept[IllegalArgumentException] {
        DeltaLakeSink.compact(spark, dir)
      }
      assert(eC.getMessage.contains("row ids"))
      // the DV delete lane works and ECHOES the add's ids verbatim
      val (v4, nDel) = DeltaLakeSink.deleteLightweight(spark, dir,
        col("id") === 11L, checkpointInterval = 0)
      assert(nDel == 1L)
      val readd = commitNodes(dir, v4)
        .flatMap(n => Option(n.get("add"))).head
      assert(bases.contains(readd.get("baseRowId").asLong),
        "the re-add must keep the ORIGINAL baseRowId")
      assert(readd.get("defaultRowCommitVersion").asLong == 2L,
        "the re-add must keep the ORIGINAL defaultRowCommitVersion")
      val expectIds = Seq(1L, 2L, 3L) ++ (10L to 21L).filter(_ != 11L) ++
        (30L to 32L)
      assert(DeltaLakeSource.read(spark, dir)
        .select("id").as[Long].collect().sorted.toSeq == expectIds.sorted)
      // checkpoint + vacuum: watermark domain and per-add ids persist
      DeltaLakeSink.writeCheckpoint(spark, dir, v4)
      val log = java.nio.file.Path.of(dir, "_delta_log")
      new java.io.File(log.toString).listFiles
        .filter(_.getName.endsWith(".json"))
        .foreach(f => java.nio.file.Files.delete(f.toPath))
      assert(DeltaLakeSource.read(spark, dir)
        .select("id").as[Long].collect().sorted.toSeq == expectIds.sorted)
      DeltaLakeSink.append(spark.range(50, 52).selectExpr("id"), dir,
        checkpointInterval = 0)
      val lastV = new java.io.File(log.toString).listFiles
        .map(_.getName).filter(_.endsWith(".json"))
        .map(_.stripSuffix(".json").toLong).max
      val basesAfter = commitNodes(dir, lastV)
        .flatMap(n => Option(n.get("add")))
        .map(_.get("baseRowId").asLong)
      assert(basesAfter.min > wm2 + 3L,
        s"post-vacuum bases must continue ABOVE the checkpointed " +
          s"watermark, got $basesAfter")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)
  }
}
