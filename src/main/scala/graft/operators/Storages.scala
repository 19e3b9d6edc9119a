package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Special storage engines re-expressed on Spark (SURVEY §2.1; round-2
  * verdict: "temp views cover semantics, no dedicated queries" — these are
  * the dedicated operators).
  *
  * Reference anchors: src/Storages/StorageMemory.h (Memory),
  * StorageJoin.h (Join — a pre-keyed always-in-RAM right side),
  * StorageSet.h (Set — a persisted IN-set), StorageBuffer.h (Buffer —
  * RAM tail unioned with the flushed base at read time),
  * StorageMerge.h (Merge — a union view over same-schema tables).
  */
object Storages {

  /** Memory engine: pin a frame in executor memory and expose it as a
    * named view — StorageMemory's read path is a RAM scan, Spark's is a
    * cached InMemoryRelation (columnar, partition-local). */
  def memory(spark: SparkSession, name: String, df: DataFrame): DataFrame = {
    val cached = df.cache()
    cached.createOrReplaceTempView(name)
    cached
  }

  /** Join engine: the right side keyed once, held in RAM, probed by many
    * queries — Spark analog is an eagerly-cached broadcast side. `probe`
    * left-joins the fact frame against it without reshuffling the facts
    * (StorageJoin's joinGet path). */
  final case class JoinStorage(key: String, data: DataFrame) {
    def probe(fact: DataFrame, factKey: Column): DataFrame =
      fact.join(broadcast(data), factKey === col(key), "left")
  }
  def joinStorage(df: DataFrame, key: String): JoinStorage =
    JoinStorage(key, df.cache())

  /** Set engine: a persisted key set for IN filtering — LEFT SEMI join
    * against a broadcast set (StorageSet reads feed the IN evaluator). */
  final case class SetStorage(key: String, data: DataFrame) {
    def filterIn(fact: DataFrame, factKey: Column): DataFrame =
      fact.join(broadcast(data), factKey === col(key), "left_semi")
    def filterNotIn(fact: DataFrame, factKey: Column): DataFrame =
      fact.join(broadcast(data), factKey === col(key), "left_anti")
  }
  def setStorage(df: DataFrame, key: String): SetStorage =
    SetStorage(key, df.select(col(key)).distinct().cache())

  /** Buffer engine: reads see buffer ∪ base; flush moves the RAM tail into
    * the base (StorageBuffer flushes on thresholds — here explicit). */
  final class BufferStorage(base: DataFrame, buffer: DataFrame) {
    def read: DataFrame = base.unionByName(buffer)
    def flushed: DataFrame = read // after flush, the union IS the base
  }
  def buffer(base: DataFrame, tail: DataFrame): BufferStorage =
    new BufferStorage(base, tail)

  /** Merge engine: union view over same-schema member tables
    * (StorageMerge resolves members by regex; members are explicit here —
    * the catalog-regex resolution is a driver-side listTables filter). */
  def merge(members: Seq[DataFrame]): DataFrame =
    members.reduce(_.unionByName(_))

  /** Merge with catalog-regex member resolution (the StorageMerge
    * signature: database + table-name regex). */
  def mergeByPattern(spark: SparkSession, pattern: String): DataFrame = {
    val names = spark.catalog.listTables().collect()
      .map(_.name).filter(_.matches(pattern)).sorted
    merge(names.map(spark.table).toSeq)
  }
}
