package graft

import org.apache.hadoop.fs.Path

/** Hudi timeline awareness + time travel (round 14 — beyond the
  * listing-only reader): pending instants (`.inflight`/`.requested`
  * without a completed commit file) and instants newer than the newest
  * completed one are INVISIBLE, with the file group falling back to its
  * newest visible slice; `asOfInstant` serves historical states; log
  * blocks filter by their INSTANT_TIME header under the same rule. */
class HudiTimelineSpec extends SparkFunSuite {
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

  private def instantFile(dir: String, name: String): Unit =
    java.nio.file.Files.writeString(
      java.nio.file.Path.of(dir, ".hoodie", name), "{}")

  test("pending and uncommitted slices are invisible (the group falls " +
      "back to its newest completed slice); time travel serves the " +
      "older slice; dialect hudi('p','instant') routes") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hudi_tl").toString
    try {
      java.nio.file.Files.createDirectories(
        java.nio.file.Path.of(dir, ".hoodie"))
      // fg1: committed at t1, rewritten at t2 (committed), rewritten
      // again at t3 (INFLIGHT — must stay invisible)
      baseFile(dir, "fg1_0-1-0_20240101000000.parquet",
        Seq((1L, "v1"), (2L, "v1")))
      baseFile(dir, "fg1_0-2-0_20240102000000.parquet",
        Seq((1L, "v2"), (2L, "v2")))
      baseFile(dir, "fg1_0-3-0_20240103000000.parquet",
        Seq((1L, "v3-uncommitted"), (2L, "v3-uncommitted")))
      // fg2: written ONLY by an instant with no timeline entry at all,
      // newer than the newest completed instant — also invisible
      baseFile(dir, "fg2_0-1-0_20240104000000.parquet",
        Seq((9L, "ghost")))
      instantFile(dir, "20240101000000.commit")
      instantFile(dir, "20240102000000.commit")
      instantFile(dir, "20240103000000.commit.inflight")
      instantFile(dir, "20240103000000.commit.requested")
      val cur = graft.sources.HudiSource.read(spark, dir)
        .collect().map(r => (r.getLong(0), r.getString(1)))
        .sortBy(_._1).toSeq
      assert(cur == Seq((1L, "v2"), (2L, "v2")),
        s"pending t3 and uncommitted fg2 must be invisible, got $cur")
      // time travel to t1
      val t1 = graft.sources.HudiSource.read(spark, dir,
        asOfInstant = Some("20240101000000"))
        .collect().map(r => (r.getLong(0), r.getString(1)))
        .sortBy(_._1).toSeq
      assert(t1 == Seq((1L, "v1"), (2L, "v1")))
      // completing t3 makes the rewrite visible
      instantFile(dir, "20240103000000.commit")
      val cur2 = graft.sources.HudiSource.read(spark, dir)
        .collect().map(r => (r.getLong(0), r.getString(1)))
        .sortBy(_._1).toSeq
      assert(cur2.forall(_._2 == "v3-uncommitted"))
      // dialect: the second positional argument time-travels
      val n1 = graft.sql.ClickHouseSql.sql(spark,
        s"SELECT v FROM hudi('$dir', '20240101000000') " +
          "WHERE id = 1").collect().head.getString(0)
      assert(n1 == "v1")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("merge-on-read: log blocks from pending or post-asOf instants " +
      "are invisible under the same rule") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hudi_tl2").toString
    try {
      java.nio.file.Files.createDirectories(
        java.nio.file.Path.of(dir, ".hoodie"))
      val rows = Seq(("k1", 1L, "a"), ("k2", 2L, "b"))
      val tmp = s"$dir/__tmp"
      rows.toDF("_hoodie_record_key", "id", "v").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val fs = new Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val part = fs.listStatus(new Path(tmp)).map(_.getPath)
        .find(_.getName.startsWith("part-")).get
      fs.rename(part, new Path(dir, "fg1_0-1-0_20240101000000.parquet"))
      fs.delete(new Path(tmp), true)
      val avroSchema = new org.apache.avro.Schema.Parser().parse("""
        {"type":"record","name":"r","fields":[
          {"name":"_hoodie_record_key","type":"string"},
          {"name":"id","type":"long"},
          {"name":"v","type":"string"}]}""")
      def rec(k: String, id: Long, v: String) = {
        val g = new org.apache.avro.generic.GenericData.Record(avroSchema)
        g.put("_hoodie_record_key", k); g.put("id", id); g.put("v", v)
        g.asInstanceOf[org.apache.avro.generic.GenericRecord]
      }
      val log = new Path(dir, ".fg1_20240101000000.log.1_0-1-0")
      // t2: committed upsert of k1; t3: PENDING delete of k2
      graft.sources.HudiLogFormat.appendDataBlock(fs, log,
        "20240102000000", avroSchema, Seq(rec("k1", 1L, "a2")))
      graft.sources.HudiLogFormat.appendDeleteBlock(fs, log,
        "20240103000000", Seq("k2"))
      instantFile(dir, "20240101000000.commit")
      instantFile(dir, "20240102000000.deltacommit")
      instantFile(dir, "20240103000000.deltacommit.inflight")
      val cur = graft.sources.HudiSource.read(spark, dir)
        .select("id", "v").as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(cur == Seq((1L, "a2"), (2L, "b")),
        s"the pending delete block must be invisible, got $cur")
      // asOf t1: even the committed t2 upsert must roll back
      val t1 = graft.sources.HudiSource.read(spark, dir,
        asOfInstant = Some("20240101000000"))
        .select("id", "v").as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(t1 == Seq((1L, "a"), (2L, "b")))
      // completing t3 applies the delete
      instantFile(dir, "20240103000000.deltacommit")
      val cur2 = graft.sources.HudiSource.read(spark, dir)
        .select("id", "v").as[(Long, String)].collect().sortBy(_._1).toSeq
      assert(cur2 == Seq((1L, "a2")))
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }

  test("merge precedence follows the BLOCK commit instant across file " +
      "groups: a later delete in an earlier-sliced group's log beats an " +
      "earlier log insert elsewhere; a newer base slice beats older " +
      "log blocks") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hudi_prec").toString
    try {
      java.nio.file.Files.createDirectories(
        java.nio.file.Path.of(dir, ".hoodie"))
      val s2 = spark
      import s2.implicits._
      def base(name: String, rows: Seq[(String, Long, String)]): Unit = {
        val tmp = s"$dir/__tmp"
        rows.toDF("_hoodie_record_key", "id", "v").coalesce(1)
          .write.mode("overwrite").parquet(tmp)
        val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        val part = fs.listStatus(new org.apache.hadoop.fs.Path(tmp))
          .map(_.getPath).find(_.getName.startsWith("part-")).get
        fs.rename(part, new org.apache.hadoop.fs.Path(dir, name))
        fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
      }
      // group A based at t1, group B based at t3
      base("ga_0-1-0_20240101000000.parquet", Seq(("a1", 1L, "va")))
      base("gb_0-1-0_20240103000000.parquet", Seq(("b1", 2L, "vb")))
      val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
        spark.sparkContext.hadoopConfiguration)
      val avroSchema = new org.apache.avro.Schema.Parser().parse("""
        {"type":"record","name":"r","fields":[
          {"name":"_hoodie_record_key","type":"string"},
          {"name":"id","type":"long"},
          {"name":"v","type":"string"}]}""")
      def rec(k: String, id: Long, v: String) = {
        val g = new org.apache.avro.generic.GenericData.Record(avroSchema)
        g.put("_hoodie_record_key", k); g.put("id", id); g.put("v", v)
        g.asInstanceOf[org.apache.avro.generic.GenericRecord]
      }
      // t4: key x INSERTED via group B's log; t5: x DELETED via group
      // A's log (cross-group routing, like HudiSink.deleteWhere on a
      // log-only key). File-name-order precedence would replay A's log
      // (base t1) before B's (base t3) and RESURRECT x.
      graft.sources.HudiLogFormat.appendDataBlock(fs,
        new org.apache.hadoop.fs.Path(dir,
          ".gb_20240103000000.log.1_0-0-0"),
        "20240104000000", avroSchema, Seq(rec("x", 9L, "inserted")))
      graft.sources.HudiLogFormat.appendDeleteBlock(fs,
        new org.apache.hadoop.fs.Path(dir,
          ".ga_20240101000000.log.1_0-0-0"),
        "20240105000000", Seq("x"))
      val keys = graft.sources.HudiSource.read(spark, dir)
        .select("_hoodie_record_key").as[String].collect().toSet
      assert(keys == Set("a1", "b1"),
        s"the later cross-group delete must win, got $keys")
      // a NEWER base slice (compaction/re-insert at t6) beats the old
      // t5 delete block
      base("ga_0-2-0_20240106000000.parquet",
        Seq(("a1", 1L, "va"), ("x", 9L, "reborn")))
      val keys2 = graft.sources.HudiSource.read(spark, dir)
        .select("_hoodie_record_key").as[String].collect().toSet
      assert(keys2 == Set("a1", "b1", "x"),
        s"the newer base slice must beat older log blocks, got $keys2")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir))
  }
}
