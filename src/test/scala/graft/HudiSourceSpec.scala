package graft

import org.apache.hadoop.fs.Path

/** Native Hudi copy-on-write read (round-13; reference
  * HudiMetadata.cpp: latest-timestamp base file per (partition, file
  * group)). Fixtures are hand-built per the documented layout. */
class HudiSourceSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._

  private def baseFile(dir: String, name: String,
      rows: Seq[(Long, String)]): Unit = {
    val tmp = s"$dir/__tmp"
    rows.toDF("id", "v").coalesce(1).write.mode("overwrite").parquet(tmp)
    val fs = new Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    fs.mkdirs(new Path(dir))
    val part = fs.listStatus(new Path(tmp)).map(_.getPath)
      .find(_.getName.startsWith("part-")).get
    fs.rename(part, new Path(dir, name))
    fs.delete(new Path(tmp), true)
  }

  test("copy-on-write: the latest-timestamp file per file group wins, " +
      "across partitions; older versions are ignored") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hudi").toString
    try {
      java.nio.file.Files.createDirectories(
        java.nio.file.Path.of(dir, ".hoodie"))
      // partition p=a: file group fg1 written twice — v2 wins
      baseFile(s"$dir/p=a", "fg1_0-1-0_20240101000000.parquet",
        Seq((1L, "stale"), (2L, "stale")))
      baseFile(s"$dir/p=a", "fg1_0-2-0_20240102000000.parquet",
        Seq((1L, "fresh"), (2L, "fresh")))
      // partition p=b: single version of fg2
      baseFile(s"$dir/p=b", "fg2_0-1-0_20240101000000.parquet",
        Seq((3L, "only")))
      val rows = graft.sources.HudiSource.read(spark, dir)
        .collect().map(r => (r.getLong(0), r.getString(1)))
        .sortBy(_._1).toSeq
      assert(rows == Seq((1L, "fresh"), (2L, "fresh"), (3L, "only")))
      // dialect table function lane
      val n = graft.sql.ClickHouseSql.sql(spark,
        s"SELECT count() AS n FROM hudi('$dir')").collect().head.getLong(0)
      assert(n == 3L)
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("mixed-precision instants in one file group compare on a fixed " +
      "width (round-14 ADVICE fix): a NEWER 14-digit second instant " +
      "beats an OLDER 17-digit millisecond instant") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hudi_mix").toString
    try {
      java.nio.file.Files.createDirectories(
        java.nio.file.Path.of(dir, ".hoodie"))
      // 17-digit ms instant on Jan 1; 14-digit s instant on Jan 2 —
      // numerically the 17-digit value is larger, but Jan 2 is NEWER
      baseFile(s"$dir/p=a", "fg1_0-1-0_20240101000000123.parquet",
        Seq((1L, "stale-ms")))
      baseFile(s"$dir/p=a", "fg1_0-2-0_20240102000000.parquet",
        Seq((1L, "fresh-s")))
      val rows = graft.sources.HudiSource.read(spark, dir)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(rows == Seq((1L, "fresh-s")),
        s"the Jan-2 second-precision instant must win, got $rows")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("merge-on-read gates stay loud: a keyless base refuses the " +
      "merge, corrupt log bytes refuse at decode, non-hudi dirs refuse") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hudi_mor").toString
    try {
      java.nio.file.Files.createDirectories(
        java.nio.file.Path.of(dir, ".hoodie"))
      // round 14: logs MERGE now (HudiMoRSpec) — but a base without
      // _hoodie_record_key cannot merge and must refuse, not guess
      baseFile(s"$dir/p=a", "fg1_0-1-0_20240101000000.parquet",
        Seq((1L, "x")))
      java.nio.file.Files.writeString(java.nio.file.Path.of(
        s"$dir/p=a", ".fg1_20240101000000.log.1_0-1-0"), "delta")
      val e = intercept[IllegalArgumentException] {
        graft.sources.HudiSource.read(spark, dir)
      }
      assert(e.getMessage.contains("_hoodie_record_key"))
      val e2 = intercept[Exception] {
        graft.sources.HudiSource.read(spark, "/tmp")
      }
      assert(e2.getMessage.contains(".hoodie"))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }
}
