package graft

import org.apache.spark.sql.functions.col

/** Lightweight DELETE writing Delta DELETION VECTORS (round 14 — the
  * write-side twin of the DV read; the reference's lightweight
  * `DELETE FROM` masks rows via `_row_exists` instead of rewriting
  * parts, and the Delta spelling of that mask is a DV). Pins the
  * contract: NO data file rewrites (paths keep identity), the protocol
  * upgrades to (3, 7) enumerating implied legacy features, a second
  * delete OR-merges the existing bitmap, zero matches commit nothing,
  * a CoW mutation composes afterwards (rewritten files drop the DV),
  * collisions are loud, and delta.appendOnly refuses. */
class DeltaDvWriteSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._
  import graft.sources.{DeltaLakeSink, DeltaLakeSource}

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_dvw_$tag")
      .toString + "/t"

  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)

  private def dataFiles(dir: String): Set[String] =
    new java.io.File(dir).listFiles.map(_.getName)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_")).toSet

  private def commitLines(dir: String, v: Long)
      : Seq[com.fasterxml.jackson.databind.JsonNode] = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    java.nio.file.Files.readString(java.nio.file.Path.of(
      dir, "_delta_log", f"$v%020d.json"))
      .split("\n").map(_.trim).filter(_.nonEmpty).toSeq
      .map(mapper.readTree)
  }

  test("lightweight delete masks rows through a DV: file identity " +
      "preserved, protocol upgraded with implied legacy features, time " +
      "travel intact, zero-match commits nothing") {
    val dir = tmp("basic")
    try {
      DeltaLakeSink.append(
        (1L to 40L).map(i => (i, s"n$i", if (i <= 20) "a" else "b"))
          .toDF("id", "name", "p"),
        dir, partitionBy = Seq("p"))
      val files0 = dataFiles(dir)
      val (v, n) = DeltaLakeSink.deleteLightweight(spark, dir,
        col("id") % 5 === 0)
      assert(v == 1L && n == 8L, s"got ($v, $n)")
      // NO data file rewrites: the parquet set may only GROW by DV bins
      assert(dataFiles(dir) == files0,
        "a lightweight delete must not add or remove data files")
      assert(new java.io.File(dir).listFiles.map(_.getName)
        .exists(_.startsWith("deletion_vector_")),
        "the DV file must exist at the table root")
      val lines = commitLines(dir, 1L)
      val proto = lines.flatMap(l => Option(l.get("protocol"))).head
      assert(proto.get("minReaderVersion").asInt == 3 &&
        proto.get("minWriterVersion").asInt == 7)
      val wf = (0 until proto.get("writerFeatures").size)
        .map(proto.get("writerFeatures").get(_).asText).toSet
      assert(wf == Set("appendOnly", "invariants", "deletionVectors"),
        s"the upgrade must enumerate minWriter-2's implied features, got $wf")
      val adds = lines.flatMap(l => Option(l.get("add")))
      assert(adds.nonEmpty && adds.forall(a =>
        a.get("deletionVector").get("storageType").asText == "u"))
      // PROTOCOL.md DV writer requirement (r14 ADVICE): every add that
      // carries a deletionVector must ship stats with the file's
      // PHYSICAL numRecords and tightBounds=false
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      adds.foreach { a =>
        val statsNode = a.get("stats")
        assert(statsNode != null, "DV add must carry stats")
        val st = mapper.readTree(statsNode.asText)
        assert(!st.get("tightBounds").asBoolean)
        val nr = st.get("numRecords").asLong
        val masked = a.get("deletionVector").get("cardinality").asLong
        assert(nr > 0 && nr >= masked,
          s"physical numRecords $nr must bound the DV cardinality $masked")
      }
      assert(adds.map(a => mapper.readTree(a.get("stats").asText)
        .get("numRecords").asLong).sum == 40L,
        "summed physical numRecords must equal the table's written rows")
      val ids = DeltaLakeSource.read(spark, dir)
        .select("id").as[Long].collect().sorted.toSeq
      assert(ids == (1L to 40L).filterNot(_ % 5 == 0))
      assert(DeltaLakeSource.read(spark, dir, versionAsOf = Some(0L))
        .count() == 40L)
      // partition values echo verbatim on the re-added files
      val pvs = adds.map(_.get("partitionValues").get("p").asText).toSet
      assert(pvs.subsetOf(Set("a", "b")) && pvs.nonEmpty)
      // zero-match: no commit
      val (v2, n2) = DeltaLakeSink.deleteLightweight(spark, dir,
        col("id") > 999)
      assert(v2 == 1L && n2 == 0L)
      assert(!new java.io.File(dir,
        "_delta_log/" + f"${2L}%020d.json").exists)
    } finally cleanup(dir)
  }

  test("a second lightweight delete OR-merges the existing DV and a " +
      "CoW update composes afterwards (rewritten file drops its DV)") {
    val dir = tmp("merge")
    try {
      DeltaLakeSink.append((1L to 10L).map(i => (i, i * 10L))
        .toDF("id", "v").repartition(1), dir)
      val (v1, n1) = DeltaLakeSink.deleteLightweight(spark, dir,
        col("id") <= 2)
      assert(v1 == 1L && n1 == 2L)
      val (v2, n2) = DeltaLakeSink.deleteLightweight(spark, dir,
        col("id") <= 4) // 1, 2 already masked — only 3, 4 remain
      assert(v2 == 2L && n2 == 2L)
      val add2 = commitLines(dir, 2L)
        .flatMap(l => Option(l.get("add"))).head
      assert(add2.get("deletionVector").get("cardinality").asLong == 4L,
        "the new DV must carry the MERGED cardinality")
      assert(DeltaLakeSource.read(spark, dir)
        .select("id").as[Long].collect().sorted.toSeq == (5L to 10L))
      // CoW update now: the matched file rewrites WITHOUT a DV
      val (v3, n3) = DeltaLakeSink.update(spark, dir,
        Seq("v" -> (col("v") + 1)), col("id") === 5)
      assert(v3 == 3L && n3 == 1L)
      val text3 = java.nio.file.Files.readString(java.nio.file.Path.of(
        dir, "_delta_log", f"${3L}%020d.json"))
      assert(text3.contains("\"remove\"") &&
        !text3.contains("deletionVector"))
      val got = DeltaLakeSource.read(spark, dir)
        .select("id", "v").as[(Long, Long)].collect().sortBy(_._1).toSeq
      assert(got == (5L to 10L).map(i =>
        (i, if (i == 5) i * 10 + 1 else i * 10)))
    } finally cleanup(dir)
  }

  test("the DV byte cap validates POST-merge table-wide total: a write " +
      "that would break every subsequent read refuses loudly, points at " +
      "OPTIMIZE, and commits nothing") {
    val dir = tmp("cap")
    val oldCap = DeltaLakeSource.MaxDvBytes
    try {
      DeltaLakeSink.append((1L to 200L).map(i => (i, i * 10L))
        .toDF("id", "v").repartition(4), dir)
      // first delete under the normal cap: establishes existing DVs
      val (v1, _) = DeltaLakeSink.deleteLightweight(spark, dir,
        col("id") % 7 === 0)
      assert(v1 == 1L)
      // shrink the cap to sit BETWEEN the existing DV total (so the
      // scan through existing DVs still reads) and existing + new (so
      // the SECOND delete's post-merge validation must refuse) — the
      // r14 form only counted the fresh blobs and let the table cross
      // the read cap
      val existingDvBytes = {
        val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
        commitLines(dir, 1L).flatMap(l => Option(l.get("add")))
          .map(_.get("deletionVector").get("sizeInBytes").asLong).sum
      }
      DeltaLakeSource.MaxDvBytes = existingDvBytes + 8L
      val e = intercept[IllegalArgumentException] {
        DeltaLakeSink.deleteLightweight(spark, dir, col("id") % 11 === 0)
      }
      assert(e.getMessage.contains("OPTIMIZE"),
        s"cap refusal must point at compaction: ${e.getMessage}")
      DeltaLakeSource.MaxDvBytes = oldCap
      // nothing committed; the table still reads and the delete now lands
      assert(!new java.io.File(dir,
        "_delta_log/" + f"${2L}%020d.json").exists)
      val (v2, n2) = DeltaLakeSink.deleteLightweight(spark, dir,
        col("id") % 11 === 0)
      assert(v2 == 2L && n2 > 0L)
      assert(DeltaLakeSource.read(spark, dir).count() ==
        (1L to 200L).count(i => i % 7 != 0 && i % 11 != 0))
    } finally {
      DeltaLakeSource.MaxDvBytes = oldCap
      cleanup(dir)
    }
  }

  test("collision is loud; delta.appendOnly refuses; the dialect " +
      "DELETE FROM routes to the lightweight lane") {
    val dir = tmp("gate")
    try {
      DeltaLakeSink.append((1L to 8L).map(i => (i, s"x$i"))
        .toDF("id", "name"), dir)
      DeltaLakeSink.commitFailpoint = () =>
        java.nio.file.Files.writeString(java.nio.file.Path.of(
          dir, "_delta_log", f"${1L}%020d.json"),
          """{"add":{"path":"ghost.parquet","partitionValues":{},""" +
            """"size":1,"modificationTime":1,"dataChange":true}}""" + "\n")
      val e = try intercept[IllegalStateException] {
        DeltaLakeSink.deleteLightweight(spark, dir, col("id") === 1)
      } finally DeltaLakeSink.commitFailpoint = () => ()
      assert(e.getMessage.contains("concurrent commit"))
      java.nio.file.Files.delete(java.nio.file.Path.of(
        dir, "_delta_log", f"${1L}%020d.json"))
      // dialect: DELETE FROM = lightweight (a DV commit, not a rewrite)
      val files0 = dataFiles(dir)
      val del = graft.sql.ClickHouseSql.sql(spark,
        s"DELETE FROM FUNCTION deltaLake('$dir') WHERE id % 2 = 0")
        .collect().head
      assert(del.getLong(0) == 1L && del.getLong(1) == 4L)
      assert(dataFiles(dir) == files0,
        "DELETE FROM must be the masking lane — no rewrites")
      assert(graft.sql.ClickHouseSql.sql(spark,
        s"SELECT count() AS n FROM deltaLake('$dir')")
        .collect().head.getLong(0) == 4L)
      // delta.appendOnly blocks the lightweight delete too
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val schemaString = mapper.readTree(java.nio.file.Files.readString(
        java.nio.file.Path.of(dir, "_delta_log", f"${0L}%020d.json"))
        .split("\n").find(_.contains("metaData")).get)
        .get("metaData").get("schemaString").asText
      java.nio.file.Files.writeString(java.nio.file.Path.of(
        dir, "_delta_log", f"${2L}%020d.json"),
        mapper.writeValueAsString(java.util.Map.of(
          "metaData", java.util.Map.of(
            "id", "t", "schemaString", schemaString,
            "partitionColumns", java.util.List.of[String](),
            "configuration",
            java.util.Map.of("delta.appendOnly", "true")))) + "\n")
      val e2 = intercept[IllegalArgumentException] {
        DeltaLakeSink.deleteLightweight(spark, dir, col("id") === 3)
      }
      assert(e2.getMessage.contains("appendOnly"))
    } finally cleanup(dir)
  }
}
