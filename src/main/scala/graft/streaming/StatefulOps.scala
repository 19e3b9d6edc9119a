package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via KeyValueGroupedDataset.mapGroupsWithState —
  * the arbitrary-state surface the reference covers with stateful
  * WindowView aggregation state (src/Storages/WindowView/
  * StorageWindowView.h aggregate-state windows) and AggregatingMergeTree
  * re-aggregation. Partial per-key state lives in the state store,
  * partitioned by key — at 1000 executors each key's state is local to
  * its shuffle partition, checkpointed incrementally.
  */
object StatefulOps {

  final case class UserTotals(user_id: Long, n: Long, sum_cents: Long)

  /** Running per-user totals (count + exact cent sum) maintained as
    * explicit state; UPDATE-mode emission per micro-batch. The cent
    * fixed-point keeps the state exact, so after a full bounded replay the
    * final emission per key equals the batch groupBy — asserted in
    * StreamingSpec. */
  def userRunningTotals(events: DataFrame): Dataset[UserTotals] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"),
        round(col("value") * 10000).cast("long").as("cents"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserTotals, UserTotals](GroupStateTimeout.NoTimeout) {
        case (user, rows, state: GroupState[UserTotals]) =>
          val prev = state.getOption.getOrElse(UserTotals(user, 0L, 0L))
          var n = prev.n
          var s = prev.sum_cents
          rows.foreach { r => n += 1; s += r._2 }
          val next = UserTotals(user, n, s)
          state.update(next)
          next
      }
  }

  /** Drive a bounded replay to completion and return the FINAL state per
    * user — the stream==batch equivalence surface. */
  def replayToFinalTotals(spark: SparkSession, stream: DataFrame): Map[Long, (Long, Long)] = {
    val acc = scala.collection.concurrent.TrieMap.empty[Long, (Long, Long)]
    val q = userRunningTotals(stream).writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (batch: Dataset[UserTotals], _: Long) =>
        batch.collect().foreach(t => acc(t.user_id) = (t.n, t.sum_cents))
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    acc.toMap
  }
}
