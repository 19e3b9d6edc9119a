package graft.sql

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** LIVE VIEW + WATCH — the reference's push-channel view
  * (src/Storages/LiveView/StorageLiveView.h:28,105-116 and
  * StorageLiveView.cpp:687-745): a live view keeps a VERSION counter
  * that bumps only when the hash of the query result CHANGES
  * (`getBlocksHashKey`; "Update blocks only if hash keys do not
  * match"), serves its result with an ephemeral `_version` column, and
  * `WATCH lv [EVENTS] [LIMIT n]` emits (result, version) — or bare
  * versions with EVENTS — per update.
  *
  * Spark rendering (single-session batch engine — no push socket):
  *  - CREATE LIVE VIEW registers a catalog VIEW (SELECT stays fresh by
  *    construction: Catalyst expands the view body at read time) plus a
  *    ledger entry (version, last result hash, bounded version history).
  *  - Version bumps are LAZY and idempotent: every WATCH re-evaluates
  *    the stored SELECT and bumps iff the result hash changed — an
  *    underlying INSERT therefore bumps the version exactly once, no
  *    matter how many WATCHes observe it (the reference's hash-compare,
  *    re-expressed pull-side).
  *  - The hash is an ORDER-INSENSITIVE multiset hash (sum of per-row
  *    xxhash64 over all columns), computed as a distributed aggregate —
  *    nothing but one (count, sum) row reaches the driver. WATCH EVENTS
  *    costs exactly that one aggregate scan; plain WATCH adds the
  *    result scan the client is about to consume anyway (the reference
  *    likewise materializes the result blocks it hashes). Never a
  *    driver-side result collect. (The reference hashes blocks in
  *    block order; a distributed engine has no stable block order.)
  *  - `WATCH lv LIMIT n` returns the last n versions joined with the
  *    CURRENT result rows (`_version` column, StorageLiveView.cpp:716);
  *    historical result SNAPSHOTS are not retained — only version
  *    numbers, hashes, row counts and timestamps (bounded driver
  *    state) — a documented deviation from the reference's in-memory
  *    blocks cache, which does not scale past a single node.
  *  - `WATCH lv EVENTS LIMIT n` returns the last n recorded versions,
  *    ascending, as bare `version` rows (LiveViewEventsSource.h).
  */
object LiveViews {

  final case class VersionEntry(version: Long, hash: Long, rows: Long,
      at: java.sql.Timestamp)

  final case class LiveView(name: String, select: String,
      version: Long, lastHash: Long, history: Vector[VersionEntry])

  private val maxHistory = 1024 // bounded ledger per view

  private val views =
    new java.util.concurrent.ConcurrentHashMap[String, LiveView]()

  def contains(name: String): Boolean = views.containsKey(name.toLowerCase)

  def list: Seq[(String, String, Long, Long)] = {
    import scala.jdk.CollectionConverters._
    views.asScala.values.toSeq.sortBy(_.name)
      .map(v => (v.name, v.select, v.version, v.history.size.toLong))
  }

  def remove(name: String): Unit = {
    stopPush(name)
    views.remove(name.toLowerCase)
  }

  /** The stored SELECT of a live view (privilege gating reads through
    * to its base tables). */
  def selectOf(name: String): Option[String] =
    Option(views.get(name.toLowerCase)).map(_.select)

  def clear(): Unit = views.clear()

  /** Order-insensitive multiset hash + row count of the view's CURRENT
    * result: one distributed aggregate, one driver row. The per-row
    * hashes sum on a DECIMAL(38) carrier — an ANSI long sum overflows
    * after a handful of near-Long.Max hash values (XOR would be
    * overflow-free but cancels duplicate rows in pairs). */
  private def resultFingerprint(df: DataFrame): (Long, Long) = {
    val cols = df.columns.map(col)
    val r = df.agg(count(lit(1)).as("n"),
      sum(xxhash64(cols: _*).cast("decimal(38,0)")).as("h")).head()
    val h = if (r.isNullAt(1)) 0L
      else r.getDecimal(1).unscaledValue().longValue() // wrap to 64 bits
    (r.getLong(0), h)
  }

  private def viewOf(name: String): LiveView =
    Option(views.get(name.toLowerCase)).getOrElse(
      throw new IllegalArgumentException(s"WATCH: `$name` is not a live view"))

  /** Exactly-once version bump for an observed (hash, rows) pair —
    * `ConcurrentHashMap.compute` makes concurrent WATCHes of the same
    * update race-free (only the first observer of a new hash bumps).
    * A WATCH/refresh racing DROP VIEW must NOT resurrect the dropped
    * view: when the entry is already absent the compute lambda returns
    * null (leaves it absent) and the caller gets the same "not a live
    * view" error a straight WATCH of a missing view raises. */
  private def bump(key: String, h: Long, rows: Long): LiveView = {
    val out = views.compute(key, (_, cur) => {
      if (cur == null) null // dropped mid-evaluation: stay dropped
      else if (h == cur.lastHash) cur
      else {
        val v = cur.version + 1
        cur.copy(version = v, lastHash = h,
          history = (cur.history :+ VersionEntry(v, h, rows,
            new java.sql.Timestamp(System.currentTimeMillis())))
            .takeRight(maxHistory))
      }
    })
    if (out == null)
      throw new IllegalArgumentException(
        s"WATCH: `$key` is not a live view")
    out
  }

  /** Re-evaluate `name` and bump its version iff the result hash
    * changed since the last evaluation (StorageLiveView.cpp:722-745).
    * Returns the post-evaluation ledger entry. */
  def refresh(spark: SparkSession, name: String,
      run: String => DataFrame): LiveView = {
    val lv = viewOf(name)
    val (rows, h) = resultFingerprint(run(lv.select))
    bump(name.toLowerCase, h, rows)
  }

  /** CREATE LIVE VIEW: temp view (text-derived plan — re-resolved per
    * read, so plain SELECT stays fresh across base-table inserts) plus
    * a ledger entry at version 1 with the creation-time result hash
    * (the reference materializes the first result on create). */
  def create(spark: SparkSession, name: String, chSelect: String,
      ifNotExists: Boolean, toSpark: String => String): Unit = {
    val key = name.toLowerCase
    if (views.containsKey(key)) {
      if (ifNotExists) return
      throw new IllegalArgumentException(s"live view `$name` already exists")
    }
    val body = toSpark(chSelect)
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW $name AS $body")
    val (rows, h) = resultFingerprint(spark.sql(body))
    views.put(key, LiveView(name, chSelect, 1L, h,
      Vector(VersionEntry(1L, h, rows,
        new java.sql.Timestamp(System.currentTimeMillis())))))
  }

  // ---- streaming push lane (round 12) --------------------------------

  private val pushes = new java.util.concurrent.ConcurrentHashMap[
    String, org.apache.spark.sql.streaming.StreamingQuery]()

  /** Current version without re-evaluating (ledger read only). */
  def versionOf(name: String): Long = viewOf(name).version

  /** Write-side PUSH — the reference's `writeIntoLiveView` chain
    * (StorageLiveView.h:25 BlocksMetadata: an INSERT into a base table
    * recomputes the view and bumps `_version` if the hash changed,
    * WITHOUT any client request). Spark rendering: a Structured
    * Streaming file source over the base TABLE's directory is the
    * write signal — each micro-batch that surfaces new files triggers
    * re-evaluation of the stored SELECT under the SAME pinned
    * fingerprint contract (`refresh`), so an INSERT lands in the
    * version ledger with no intervening WATCH. The micro-batch carries
    * only the inserted DELTA (the file source reads new files only);
    * the recompute is the stored SELECT itself — exactly the LIVE VIEW
    * contract, now push-scheduled instead of poll-scheduled. Batch 0
    * is the create-time snapshot: its hash matches the creation
    * fingerprint, so it never bumps. */
  def startPush(spark: SparkSession, name: String, baseTable: String,
      run: String => DataFrame)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    viewOf(name) // must exist (same error as WATCH)
    val key = name.toLowerCase
    stopPush(name)
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(baseTable))
    val loc = meta.location.getPath
    val schema = spark.table(baseTable).schema
    val stream = spark.readStream.schema(schema)
      .option("basePath", loc).parquet(loc)
    val q = stream.writeStream
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime("500 milliseconds"))
      .foreachBatch { (_: org.apache.spark.sql.Dataset[
          org.apache.spark.sql.Row], _: Long) =>
        refresh(spark, name, run); ()
      }
      .queryName(s"live_view_push_$key")
      .start()
    pushes.put(key, q)
    q
  }

  /** Stop the push lane (idempotent; DROP VIEW calls this too). */
  def stopPush(name: String): Unit =
    Option(pushes.remove(name.toLowerCase))
      .foreach(q => scala.util.Try(q.stop()))

  /** WATCH lv EVENTS [LIMIT n]: the last n recorded versions,
    * ascending (all of them without LIMIT). */
  def watchEvents(spark: SparkSession, name: String, limit: Option[Int],
      run: String => DataFrame): DataFrame = {
    val lv = refresh(spark, name, run)
    val hist = limit.map(n => lv.history.takeRight(n)).getOrElse(lv.history)
    import spark.implicits._
    hist.map(_.version).toDF("version")
  }

  /** WATCH lv [LIMIT n]: the CURRENT result with the `_version`
    * ephemeral column (StorageLiveView.cpp:716). LIMIT bounds how many
    * updates a streaming client would wait for; a batch engine serves
    * the latest state exactly once.
    *
    * ONE evaluation serves both the fingerprint and the client:
    * `localCheckpoint` pins the result rows in executor storage
    * (distributed — never a driver collect), the hash is computed over
    * that SAME materialized frame, and the frame is what's returned —
    * so under concurrent inserts the served rows always match the
    * reported `_version`, and the stored SELECT's scan cost is paid
    * once per WATCH, not twice. */
  def watch(spark: SparkSession, name: String,
      run: String => DataFrame): DataFrame = {
    val lv0 = viewOf(name)
    val snap = run(lv0.select).localCheckpoint()
    val (rows, h) = resultFingerprint(snap)
    val lv = bump(name.toLowerCase, h, rows)
    snap.withColumn("_version", lit(lv.version))
  }
}
