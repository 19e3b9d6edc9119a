package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Count}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat

/** The reference's `optimize_trivial_count_query`
  * (src/Interpreters/InterpreterSelectQuery.cpp — a bare
  * `SELECT count() FROM t` answers from part metadata, never scanning):
  * an unfiltered global `count( )` over a parquet relation folds to a
  * LocalRelation whose value is the SUM OF FOOTER ROW COUNTS — driver
  * metadata reads (one footer per file), zero executor tasks, zero data
  * IO. At 100 TB this is the difference between a metadata lookup and a
  * full-corpus scan for the most common ad-hoc query there is.
  *
  * Guards: fires ONLY on Aggregate(no grouping, exactly one
  * Count(lit)/Count(*)) whose child is the bare relation (possibly under
  * a column-pruning Project) — any Filter/Join/generator in between
  * leaves the plan untouched. Correctness is footer-exact: parquet row
  * counts are authoritative for immutable files, and every mutation path
  * in this engine rewrites files (never in-place).
  */
object TrivialCount {

  private val installed =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean])

  def install(spark: SparkSession): Unit = synchronized {
    if (!installed.contains(spark)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ CountRule(spark)
      installed.add(spark)
    }
  }

  /** Footer row counts summed across a file list (driver-side, bounded:
    * one footer read per file — the same IO class as listing). */
  private def footerCount(spark: SparkSession, files: Seq[String]): Long = {
    val conf = spark.sparkContext.hadoopConfiguration
    files.map { f =>
      val in = org.apache.parquet.hadoop.util.HadoopInputFile
        .fromPath(new org.apache.hadoop.fs.Path(f), conf)
      val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
      try r.getRecordCount finally r.close()
    }.sum
  }

  case class CountRule(spark: SparkSession) extends Rule[LogicalPlan] {

    private def bareParquet(plan: LogicalPlan): Option[HadoopFsRelation] =
      plan match {
        case Project(projectList, child)
            if projectList.forall(_.isInstanceOf[AttributeReference]) =>
          bareParquet(child)
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation
              if fs.fileFormat.isInstanceOf[ParquetFileFormat] &&
                fs.partitionSchema.isEmpty =>
            Some(fs)
          case _ => None
        }
        case _ => None
      }

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case agg @ Aggregate(Nil, Seq(a @ Alias(
          AggregateExpression(Count(Seq(_: Literal)), Complete, false, None, _),
          _)), child, _) =>
        bareParquet(child) match {
          case Some(fs) =>
            val n = footerCount(spark, fs.location.inputFiles.toSeq)
            LocalRelation(Seq(a.toAttribute), Seq(InternalRow(n)))
          case None => agg
        }
    }
  }
}
