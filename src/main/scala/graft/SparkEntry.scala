package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.{queries => qp}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every implemented operator's query + oracle from the per-area
  * query packs (graft.queries.*). Each pack entry corresponds to a line of
  * the SURVEY.md §2 operator inventory.
  */
object SparkEntry {

  /** All query packs, in SURVEY §7 build order. */
  def packs: Seq[QueryPack] = Seq(
    qp.Relational,
    qp.AggFunctions,
    qp.WindowQueries,
    qp.SortLimit,
    qp.SetOps,
    qp.JoinExtras,
    qp.ScalarFunctions,
    qp.LlmPipeline,
    qp.DialectQueries,
    qp.TimeWindows,
    qp.Extras,
    qp.Extras2,
    qp.Extras3,
    qp.Extras4,
    qp.StatAggregates,
    qp.Formats,
    qp.BitmapQueries,
    qp.MutationQueries,
    qp.Extras5,
    qp.StorageQueries,
    qp.MlQueries,
    qp.TpchExtra,
    qp.FunctionTail,
    qp.FunctionTail2,
    qp.LlmPipeline2,
    qp.LlmPipeline3,
    qp.LlmPipeline4,
    qp.WideIntQueries,
    qp.IndexQueries,
    qp.CodecQueries,
    qp.LifecycleQueries,
    qp.JoinSqlQueries,
    qp.KqlQueries,
    qp.Extras6,
    qp.Extras7,
    qp.Extras8
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    qp.Relational.q5DataFrame(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.queries).flatMap(q => q.oracle.map(q.name -> _)).toMap
}
