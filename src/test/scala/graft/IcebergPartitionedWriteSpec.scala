package graft

import org.apache.spark.sql.functions.col

/** Iceberg PARTITIONED writes, identity transforms (round 15 — the r14
  * verdict's Missing #2; reference surface: the fork's Iceberg
  * partition handling under Storages/ObjectStorage/DataLakes/Iceberg).
  * Pins: the creation records an identity partition spec
  * (spec-id 0, field-ids from 1000), data files split one tuple per
  * file with the identity columns still IN the files, manifest entries
  * carry the tuple, manifest-level pruning reads ONLY the matching
  * partition's files, appends derive the spec (a mismatched explicit
  * partitionBy is loud), non-identity transforms refuse, and
  * compaction keeps the spec. */
class IcebergPartitionedWriteSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._
  import graft.sources.{IcebergSink, IcebergSource}

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_ipw_$tag")
      .toString + "/t"

  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)

  private def frame(rows: Seq[(Long, String, String)]) =
    rows.toDF("id", "name", "p")

  test("partitioned create + append: spec recorded, one tuple per file, " +
      "identity columns in the data files, manifest-level pruning") {
    val dir = tmp("basic")
    try {
      IcebergSink.append(frame(
        (1L to 20L).map(i => (i, s"n$i", if (i <= 12) "a" else "b"))),
        dir, partitionBy = Seq("p"))
      // the spec landed in the metadata with the spec's field-id rule
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val meta = mapper.readTree(java.nio.file.Files.readString(
        java.nio.file.Path.of(dir, "metadata", "v1.metadata.json")))
      val spec = meta.get("partition-specs").get(0)
      assert(spec.get("spec-id").asInt == 0)
      val f0 = spec.get("fields").get(0)
      assert(f0.get("name").asText == "p" &&
        f0.get("transform").asText == "identity" &&
        f0.get("field-id").asInt == 1000)
      assert(meta.get("default-spec-id").asInt == 0)
      // roundtrip: identity columns ARE in the data files
      val all = IcebergSource.read(spark, dir)
      assert(all.columns.toSeq == Seq("id", "name", "p"))
      assert(all.count() == 20L)
      assert(all.filter(col("p") === "b").count() == 8L)
      // append DERIVES the spec; the new rows split by tuple too
      IcebergSink.append(frame(Seq((21L, "x", "a"), (22L, "y", "c"))), dir)
      assert(IcebergSource.read(spark, dir).count() == 22L)
      // manifest-level pruning: a partitionEq scan must LIST only the
      // matching partition's files (file-level, before any footer)
      val prunedC = IcebergSource.read(spark, dir,
        partitionEq = Map("p" -> Some("c")))
      assert(prunedC.count() == 1L &&
        prunedC.select("id").as[Long].head() == 22L)
      assert(prunedC.inputFiles.length == 1,
        s"partition c holds one file, scanned ${prunedC.inputFiles.length}")
      val prunedA = IcebergSource.read(spark, dir,
        partitionEq = Map("p" -> Some("a")))
      assert(prunedA.count() == 13L)
      val allFiles = IcebergSource.read(spark, dir).inputFiles.length
      assert(prunedA.inputFiles.length < allFiles,
        "pruning must scan strictly fewer files than the full table")
    } finally cleanup(dir)
  }

  test("dialect INSERT INTO FUNCTION iceberg/hudi PARTITION BY (…) " +
      "creates the partitioned layout") {
    val di = tmp("dlg_ice")
    val dh = tmp("dlg_hudi")
    try {
      val ch = (q: String) => graft.sql.ClickHouseSql.sql(spark, q)
      ch(s"INSERT INTO FUNCTION iceberg('$di') PARTITION BY (p) " +
        "SELECT 1 AS id, 'a' AS p UNION ALL SELECT 2, 'b'")
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val m = mapper.readTree(java.nio.file.Files.readString(
        java.nio.file.Path.of(di, "metadata", "v1.metadata.json")))
      assert(m.get("partition-specs").get(0).get("fields")
        .get(0).get("name").asText == "p")
      assert(IcebergSource.read(spark, di).count() == 2L)
      ch(s"INSERT INTO FUNCTION hudi('$dh') PARTITION BY (p) " +
        "SELECT 'k1' AS _hoodie_record_key, 1 AS id, 'a' AS p " +
        "UNION ALL SELECT 'k2', 2, 'b'")
      val dirs = new java.io.File(dh).listFiles.filter(_.isDirectory)
        .map(_.getName).filterNot(_.startsWith(".")).sorted.toSeq
      assert(dirs == Seq("p=a", "p=b"), s"got $dirs")
      assert(graft.sources.HudiSource.read(spark, dh).count() == 2L)
    } finally { cleanup(di); cleanup(dh) }
  }

  test("position deletes on a partitioned table (round 15): masks span " +
      "partitions, manifest pruning survives, compaction clears the " +
      "delete files and keeps the spec, CoW still refuses loudly") {
    val dir = tmp("posdel")
    try {
      IcebergSink.append(frame(
        (1L to 20L).map(i => (i, s"n$i", if (i <= 12) "a" else "b"))),
        dir, partitionBy = Seq("p"))
      val (_, nDel) = IcebergSink.deleteLightweight(spark, dir,
        col("id") % 4 === 0) // 4,8,12 in p=a; 16,20 in p=b
      assert(nDel == 5L)
      val after = IcebergSource.read(spark, dir)
        .select("id").as[Long].collect().sorted.toSeq
      assert(after == (1L to 20L).filterNot(_ % 4 == 0))
      // manifest pruning composes with the delete mask
      val prunedB = IcebergSource.read(spark, dir,
        partitionEq = Map("p" -> Some("b")))
      assert(prunedB.select("id").as[Long].collect().sorted.toSeq ==
        Seq(13L, 14L, 15L, 17L, 18L, 19L))
      val allFiles = IcebergSource.read(spark, dir).inputFiles.length
      assert(prunedB.inputFiles.length < allFiles)
      // CoW mutations still refuse (delete files present AND
      // partitioned) — the message routes to the working lanes
      val e = intercept[IllegalArgumentException] {
        IcebergSink.update(spark, dir, Seq("name" -> col("name")),
          col("id") === 1)
      }
      assert(e.getMessage.toLowerCase.contains("partitioned") ||
        e.getMessage.contains("delete files"))
      // compaction materializes the masked state, drops the delete
      // files, keeps the spec
      IcebergSink.compact(spark, dir)
      val compacted = IcebergSource.read(spark, dir)
      assert(compacted.select("id").as[Long].collect().sorted.toSeq ==
        (1L to 20L).filterNot(_ % 4 == 0))
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      val metaFiles = new java.io.File(dir, "metadata").listFiles
        .map(_.getName).filter(_.matches("v\\d+\\.metadata\\.json"))
      val last = metaFiles.map(n =>
        n.stripPrefix("v").stripSuffix(".metadata.json").toInt).max
      val m = mapper.readTree(java.nio.file.Files.readString(
        java.nio.file.Path.of(dir, "metadata", s"v$last.metadata.json")))
      assert(m.get("partition-specs").get(0).get("fields").size == 1,
        "compaction must carry the partition spec")
      // post-compaction the partition pruning works on the fresh files
      val prunedA2 = IcebergSource.read(spark, dir,
        partitionEq = Map("p" -> Some("a")))
      assert(prunedA2.select("id").as[Long].collect().sorted.toSeq ==
        (1L to 12L).filterNot(_ % 4 == 0))
      assert(prunedA2.inputFiles.length <
        IcebergSource.read(spark, dir).inputFiles.length)
    } finally cleanup(dir)
  }

  test("copy-on-write mutations on a partitioned table (round 15): " +
      "rewritten survivors re-stage per tuple, untouched files keep " +
      "their recorded tuples, pruning works after the mutation, " +
      "partition-column assignment refuses") {
    val dir = tmp("cow")
    try {
      IcebergSink.append(frame(
        (1L to 20L).map(i => (i, s"n$i", if (i <= 12) "a" else "b"))),
        dir, partitionBy = Seq("p"))
      // UPDATE touching only p=a rows (non-partition column)
      val (_, nUp) = IcebergSink.update(spark, dir,
        Seq("name" -> org.apache.spark.sql.functions.upper(col("name"))),
        col("id") <= 3)
      assert(nUp == 3L)
      val got = IcebergSource.read(spark, dir)
        .select("id", "name").as[(Long, String)].collect().toMap
      assert(got(1L) == "N1" && got(2L) == "N2" && got(3L) == "N3" &&
        got(4L) == "n4" && got.size == 20)
      // pruning still works on BOTH sides after the rewrite: untouched
      // p=b files kept their tuples; rewritten p=a files re-recorded
      val prunedB = IcebergSource.read(spark, dir,
        partitionEq = Map("p" -> Some("b")))
      assert(prunedB.count() == 8L)
      assert(prunedB.inputFiles.length <
        IcebergSource.read(spark, dir).inputFiles.length)
      val prunedA = IcebergSource.read(spark, dir,
        partitionEq = Map("p" -> Some("a")))
      assert(prunedA.count() == 12L)
      assert(prunedA.inputFiles.length <
        IcebergSource.read(spark, dir).inputFiles.length,
        "rewritten files must carry fresh tuples (else pruning on p=a " +
          "reads everything)")
      // CoW DELETE across partitions
      val (_, nDel) = IcebergSink.delete(spark, dir, col("id") % 5 === 0)
      assert(nDel == 4L) // 5, 10, 15, 20
      assert(IcebergSource.read(spark, dir)
        .select("id").as[Long].collect().sorted.toSeq ==
        (1L to 20L).filterNot(_ % 5 == 0))
      // assigning the partition column refuses loudly
      val e = intercept[IllegalArgumentException] {
        IcebergSink.update(spark, dir,
          Seq("p" -> org.apache.spark.sql.functions.lit("z")),
          col("id") === 1)
      }
      assert(e.getMessage.contains("move"))
    } finally cleanup(dir)
  }

  test("null partition values, overwrite and compaction keep the spec, " +
      "loud gates: spec mismatch and non-identity transforms") {
    val dir = tmp("gates")
    try {
      IcebergSink.append(
        Seq((1L, "a", "x"), (2L, "b", null), (3L, "c", "x"))
          .toDF("id", "name", "p"), dir, partitionBy = Seq("p"))
      val gotNull = IcebergSource.read(spark, dir,
        partitionEq = Map("p" -> None))
      assert(gotNull.count() == 1L &&
        gotNull.select("id").as[Long].head() == 2L)
      assert(gotNull.inputFiles.length == 1)
      // an explicit partitionBy that disagrees with the table's spec
      val e1 = intercept[IllegalArgumentException] {
        IcebergSink.append(Seq((9L, "z", "y")).toDF("id", "name", "p"),
          dir, partitionBy = Seq("name"))
      }
      assert(e1.getMessage.contains("does not match"))
      // overwrite keeps the derived spec; snapshots stay travelable
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      IcebergSink.overwrite(
        Seq((7L, "q", "z")).toDF("id", "name", "p"), dir)
      val m2 = mapper.readTree(java.nio.file.Files.readString(
        java.nio.file.Path.of(dir, "metadata", "v2.metadata.json")))
      assert(m2.get("partition-specs").get(0).get("fields").size == 1,
        "overwrite must carry the partition spec through")
      assert(IcebergSource.read(spark, dir).count() == 1L)
      // a transform OUTSIDE the supported family refuses loudly
      // (round 16: bucket/truncate/temporal are now first-class, so
      // the gate moved from "non-identity" to "unknown transform")
      val v2 = java.nio.file.Path.of(dir, "metadata", "v2.metadata.json")
      val node = mapper.readTree(java.nio.file.Files.readString(v2))
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      node.get("partition-specs").get(0).get("fields").get(0)
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
        .put("transform", "zorder[16]")
      java.nio.file.Files.writeString(v2, mapper.writeValueAsString(node))
      java.nio.file.Files.deleteIfExists(java.nio.file.Path.of(
        dir, "metadata", ".v2.metadata.json.crc"))
      val e2 = intercept[IllegalArgumentException] {
        IcebergSink.append(Seq((8L, "w", "z")).toDF("id", "name", "p"), dir)
      }
      assert(e2.getMessage.contains("unsupported partition transform"))
    } finally cleanup(dir)
  }
}
