package graft

import graft.streaming.{StatefulOps, WindowView}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class StreamingSpec extends SparkFunSuite {

  test("streaming tumble agg over the file-replayed events equals the batch run") {
    val stream = WindowView.eventsStream(spark, sf)
    assert(stream.isStreaming)
    val q = WindowView.liveView(
      WindowView.tumbleAgg(stream, "1 hour"), "tumble_live")
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT * FROM tumble_live ORDER BY w_start, event_type").collect()
      val batch = WindowView.tumbleAgg(Tables.load(spark, sf, "events"), "1 hour")
        .orderBy("w_start", "event_type").collect()
      assert(streamed.length == batch.length)
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    } finally q.stop()
  }

  test("streaming dedup within watermark equals batch dropDuplicates") {
    val stream = WindowView.eventsStream(spark, sf)
    // duplicate every event by unioning the stream with itself is not
    // possible on one source; instead dedup on a coarse key that repeats
    // naturally across the corpus: (user_id, event_type).
    val deduped = WindowView.dedupStream(stream, "1 day",
      Seq("user_id", "event_type"))
    val q = deduped.writeStream.format("memory")
      .queryName("dedup_live").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamedKeys = spark.sql(
        "SELECT DISTINCT user_id, event_type FROM dedup_live").count()
      val streamedRows = spark.table("dedup_live").count()
      val batchKeys = Tables.load(spark, sf, "events")
        .select("user_id", "event_type").distinct().count()
      // every surviving row is a distinct key, and all keys survive
      assert(streamedRows == streamedKeys)
      assert(streamedKeys == batchKeys)
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch join (click->purchase funnel)") {
    // every click joined to the same user's purchases within 30 minutes;
    // two independent readStream instances over the same staged corpus
    val joined = WindowView.intervalJoin(
      WindowView.eventsStream(spark, sf), WindowView.eventsStream(spark, sf),
      "click", "purchase", "1 day", "30 minutes")
    assert(joined.isStreaming)
    val q = joined.writeStream.format("memory")
      .queryName("funnel_live").outputMode("append").start()
    try {
      q.processAllAvailable()
      val streamed = spark.sql(
        "SELECT user_id, l_id, r_id FROM funnel_live ORDER BY user_id, l_id, r_id")
        .collect()
      val ev = Tables.load(spark, sf, "events")
      val batch = WindowView.intervalJoin(ev, ev,
        "click", "purchase", "1 day", "30 minutes")
        .orderBy("user_id", "l_id", "r_id").collect()
      assert(batch.nonEmpty, "corpus has no click->purchase pairs in window")
      assert(streamed.length == batch.length)
      assert(streamed.map(_.toString).toSeq == batch.map(_.toString).toSeq)
    } finally q.stop()
  }

  test("mapGroupsWithState running totals equal the batch aggregation") {
    val stream = WindowView.eventsStream(spark, sf)
    val finals = StatefulOps.replayToFinalTotals(spark, stream)
    val batch = Tables.load(spark, sf, "events")
      .groupBy("user_id")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum(
          org.apache.spark.sql.functions.round(
            org.apache.spark.sql.functions.col("value") * 10000)
            .cast("long")).as("s"))
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(finals == batch)
  }

  test("bounded watermark append mode emits only closed windows") {
    val stream = WindowView.withBoundedWatermark(
      WindowView.eventsStream(spark, sf), "30 minutes")
    val agg = WindowView.tumbleAgg(stream, "1 hour")
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("wm_append").start()
    try {
      q.processAllAvailable()
      val emitted = spark.sql("SELECT COUNT(*) FROM wm_append").collect().head.getLong(0)
      val total = WindowView.tumbleAgg(Tables.load(spark, sf, "events"), "1 hour").count()
      // every window whose end precedes (max event time - 30min) must have
      // fired; only the trailing open windows may be withheld
      assert(emitted > 0 && emitted <= total)
      assert(total - emitted <= 10, s"too many unfired windows: ${total - emitted}")
    } finally q.stop()
  }

  // --- ALLOWED_LATENESS + watermark strategy matrix (round-3 verdict #6;
  // reference src/Storages/WindowView/StorageWindowView.h:74-95,207-212) —
  // a controllable MemoryStream drives exact late-row scenarios that the
  // corpus replay cannot.

  private def memEvents(): (org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String, Double)], org.apache.spark.sql.DataFrame) = {
    val sess = spark
    import sess.implicits._
    implicit val ctx = sess.sqlContext
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(java.sql.Timestamp, String, Double)]
    (ms, ms.toDF().toDF("ts", "event_type", "value"))
  }

  private def minuteTs(m: Int): java.sql.Timestamp =
    new java.sql.Timestamp(86400000L + m * 60000L) // day-aligned base

  test("ALLOWED_LATENESS: a late row within lateness re-fires its window; beyond it, dropped") {
    val (ms, df) = memEvents()
    val agg = WindowView.tumbleWithAllowedLateness(df, "10 minutes", "1 hour")
    val q = agg.writeStream.outputMode("update")
      .format("memory").queryName("late_upd").start()
    try {
      // window [00:00,00:10) fires with n=1; max seen 00:30
      ms.addData((minuteTs(5), "e", 1.0), (minuteTs(30), "e", 2.0))
      q.processAllAvailable()
      // late row 00:06 (behind max, within 1h lateness) → window RE-FIRES n=2
      ms.addData((minuteTs(6), "e", 3.0))
      q.processAllAvailable()
      val fired = spark.sql("SELECT n FROM late_upd WHERE w_start = TIMESTAMP'1970-01-02 00:00:00'")
        .collect().map(_.getLong(0)).toSet
      assert(fired == Set(1L, 2L), s"expected re-fire 1 then 2, got $fired")
      // advance the watermark decisively past window end + lateness
      ms.addData((minuteTs(150), "e", 4.0))
      q.processAllAvailable()
      // 00:07 is now beyond ALLOWED_LATENESS (watermark 00:90 > end 00:10) → dropped
      ms.addData((minuteTs(7), "e", 5.0))
      q.processAllAvailable()
      val after = spark.sql("SELECT n FROM late_upd WHERE w_start = TIMESTAMP'1970-01-02 00:00:00'")
        .collect().map(_.getLong(0)).toSet
      assert(after == Set(1L, 2L), s"late-beyond-lateness row must be dropped, got $after")
    } finally q.stop()
  }

  test("watermark strategies: STRICTLY_ASCENDING drops the out-of-order row BOUNDED retains") {
    def totalCounted(wm: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame,
        name: String): Long = {
      val (ms, df) = memEvents()
      val agg = WindowView.tumbleAgg(wm(df), "10 minutes")
      val q = agg.writeStream.outputMode("append")
        .format("memory").queryName(name).start()
      try {
        ms.addData((minuteTs(5), "e", 1.0), (minuteTs(90), "e", 2.0)) // max seen = 01:30
        q.processAllAvailable()
        ms.addData((minuteTs(55), "e", 3.0)) // out-of-order: behind max by 35 min
        q.processAllAvailable()
        ms.addData((minuteTs(600), "e", 4.0)) // close the early windows
        q.processAllAvailable()
        ms.addData((minuteTs(1300), "e", 5.0)) // flush 10:00's window too
        q.processAllAvailable()
        spark.sql(s"SELECT COALESCE(SUM(n),0) FROM $name").collect().head.getLong(0)
      } finally q.stop()
    }
    // STRICTLY_ASCENDING (watermark == max seen): the 00:55 row is behind
    // the 01:30 watermark → dropped; rows 1,2,4 counted (the final flush
    // row's own window stays open in both runs).
    val strict = totalCounted(WindowView.withStrictlyAscendingWatermark, "wm_strict")
    // BOUNDED 1 hour: watermark 00:30 when the late row arrives → retained.
    val bounded = totalCounted(WindowView.withBoundedWatermark(_, "1 hour"), "wm_bounded")
    assert(strict == 3, s"strictly-ascending must drop the out-of-order row, counted $strict")
    assert(bounded == 4, s"bounded must retain the out-of-order row, counted $bounded")
  }

  test("materialized-view chain appends transformed micro-batches to the target") {
    val target = Files.createTempDirectory("graft_mv_t").toString
    val ckpt = Files.createTempDirectory("graft_mv_c").toString
    val q = WindowView.materializedView(
      WindowView.eventsStream(spark, sf),
      batch => batch.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("value")),
      target, ckpt)
    try q.awaitTermination() finally if (q.isActive) q.stop()
    val mv = spark.read.parquet(target)
    val expected = Tables.load(spark, sf, "events")
      .filter(col("event_type") === "purchase").count()
    assert(mv.count() == expected)
    assert(mv.columns.toSeq == Seq("event_id", "user_id", "value"))
  }

  test("LIVE VIEW push lane: an INSERT surfaces as a version bump with " +
      "NO intervening WATCH (write-side push, writeIntoLiveView)") {
    val ch = graft.sql.ClickHouseSql
    val lv = graft.sql.LiveViews
    val t = "graft_push_spec_t"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    ch.sql(spark, "DROP VIEW IF EXISTS graft_push_lv")
    ch.sql(spark, s"CREATE MATERIALIZED VIEW $t AS SELECT 1 AS k")
    ch.sql(spark,
      s"CREATE LIVE VIEW graft_push_lv AS SELECT count() AS n FROM $t")
    val q = lv.startPush(spark, "graft_push_lv", t, ch.liveViewRun(spark))
    try {
      q.processAllAvailable()
      // batch 0 = the create-time snapshot: same hash, no bump
      assert(lv.versionOf("graft_push_lv") == 1L)
      ch.sql(spark, s"INSERT INTO $t VALUES (2)")
      q.processAllAvailable()
      // the version ledger moved although NO WATCH was issued
      assert(lv.versionOf("graft_push_lv") == 2L,
        "the INSERT must push a version bump without any client WATCH")
      // a rewrite that leaves the result identical must not bump even
      // though it produces new files for the stream to see
      ch.sql(spark, s"ALTER TABLE $t DELETE WHERE k < 0")
      q.processAllAvailable()
      assert(lv.versionOf("graft_push_lv") == 2L)
      // the pushed version is the SAME ledger the pull-side serves
      assert(ch.sql(spark, "WATCH graft_push_lv EVENTS")
        .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
    } finally {
      lv.stopPush("graft_push_lv")
      scala.util.Try(ch.sql(spark, "DROP VIEW IF EXISTS graft_push_lv"))
      scala.util.Try(spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("LIVE VIEW push lane over a PARTITIONED base table: new files " +
      "under partition dirs trigger the push (basePath stream)") {
    val ch = graft.sql.ClickHouseSql
    val lv = graft.sql.LiveViews
    val t = "graft_push_part_t"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    ch.sql(spark, "DROP VIEW IF EXISTS graft_push_part_lv")
    spark.sql(s"CREATE TABLE $t (k BIGINT, p STRING) USING parquet " +
      "PARTITIONED BY (p)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'b')")
    ch.sql(spark, "CREATE LIVE VIEW graft_push_part_lv AS " +
      s"SELECT p, count() AS n FROM $t GROUP BY p")
    val q = lv.startPush(spark, "graft_push_part_lv", t,
      ch.liveViewRun(spark))
    try {
      q.processAllAvailable()
      assert(lv.versionOf("graft_push_part_lv") == 1L)
      // an INSERT creating a NEW partition directory must surface too
      spark.sql(s"INSERT INTO $t VALUES (3, 'c')")
      q.processAllAvailable()
      assert(lv.versionOf("graft_push_part_lv") == 2L,
        "a new partition's files must trigger the push")
      spark.sql(s"INSERT INTO $t VALUES (4, 'a')")
      q.processAllAvailable()
      assert(lv.versionOf("graft_push_part_lv") == 3L)
    } finally {
      lv.stopPush("graft_push_part_lv")
      scala.util.Try(ch.sql(spark, "DROP VIEW IF EXISTS graft_push_part_lv"))
      scala.util.Try(spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("LIVE VIEW: an underlying INSERT bumps the version exactly once " +
      "(hash-compare, StorageLiveView.cpp:722)") {
    val ch = graft.sql.ClickHouseSql
    val t = "graft_lv_spec_t"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), t)
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
    ch.sql(spark, "DROP VIEW IF EXISTS graft_lv_spec")
    ch.sql(spark, s"CREATE MATERIALIZED VIEW $t AS SELECT 1 AS a")
    ch.sql(spark, s"CREATE LIVE VIEW graft_lv_spec AS SELECT sum(a) AS s FROM $t")
    try {
      def v(): Long = ch.sql(spark, "WATCH graft_lv_spec")
        .collect().head.getAs[Long]("_version")
      assert(v() == 1L)
      ch.sql(spark, s"INSERT INTO $t VALUES (41)")
      // however many WATCHes observe one insert, ONE bump
      assert(v() == 2L); assert(v() == 2L); assert(v() == 2L)
      // the result rides the current version
      val r = ch.sql(spark, "WATCH graft_lv_spec").collect().head
      assert(r.getLong(r.fieldIndex("s")) == 42L)
      // EVENTS without LIMIT: full recorded history, ascending
      assert(ch.sql(spark, "WATCH graft_lv_spec EVENTS")
        .collect().map(_.getLong(0)).toSeq == Seq(1L, 2L))
      // IF NOT EXISTS is a no-op on an existing live view
      ch.sql(spark,
        s"CREATE LIVE VIEW IF NOT EXISTS graft_lv_spec AS SELECT 9 AS s")
      assert(v() == 2L)
      // SHOW CREATE renders the stored definition
      assert(ch.sql(spark, "SHOW CREATE graft_lv_spec")
        .collect().head.getString(0)
        .startsWith("CREATE LIVE VIEW graft_lv_spec AS"))
      // unknown view rejects
      intercept[IllegalArgumentException] {
        ch.sql(spark, "WATCH graft_lv_nope")
      }
    } finally {
      scala.util.Try(ch.sql(spark, "DROP VIEW IF EXISTS graft_lv_spec"))
      scala.util.Try(spark.sql(s"DROP TABLE IF EXISTS $t"))
    }
  }

  test("LIVE VIEW: a bump racing DROP VIEW does not resurrect the " +
      "dropped view (round-12 ADVICE — compute leaves the entry absent)") {
    val ch = graft.sql.ClickHouseSql
    val lv = graft.sql.LiveViews
    ch.sql(spark, "DROP VIEW IF EXISTS graft_lv_race")
    ch.sql(spark, "CREATE LIVE VIEW graft_lv_race AS SELECT 7 AS a")
    try {
      // simulate the race: the WATCH has read the pre-drop ledger entry
      // and is evaluating the stored SELECT when DROP VIEW lands — the
      // run thunk below performs the drop mid-evaluation, so the bump
      // that follows sees an absent entry and must NOT re-insert it
      assert(lv.contains("graft_lv_race"))
      val dropMidEval: String => org.apache.spark.sql.DataFrame = s => {
        lv.remove("graft_lv_race")
        ch.liveViewRun(spark)(s)
      }
      intercept[IllegalArgumentException] {
        lv.watch(spark, "graft_lv_race", dropMidEval)
      }
      assert(!lv.contains("graft_lv_race"),
        "a WATCH racing DROP VIEW must not resurrect the ledger entry")
      intercept[IllegalArgumentException] {
        ch.sql(spark, "WATCH graft_lv_race")
      }
    } finally {
      scala.util.Try(ch.sql(spark, "DROP VIEW IF EXISTS graft_lv_race"))
    }
  }
}
