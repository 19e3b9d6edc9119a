package graft.plans

import java.util.concurrent.ConcurrentHashMap

import graft.operators.SkipIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualTo, Expression, In, InSet, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}

/** TRANSPARENT skip-index pruning — the way the reference actually applies
  * its skip indexes: the user writes a plain SELECT and
  * `MergeTreeDataSelectExecutor::filterMarksUsingIndex` drops granules
  * before the scan (src/Storages/MergeTree/MergeTreeDataSelectExecutor
  * .cpp). The [[SkipIndex]] operator API is the explicit form; this Rule
  * is the implicit one: once a dataset dir has a registered bloom index,
  * ANY `Filter(col = v / col IN (...))` over its parquet scan gets its
  * file list pruned in the optimizer — the Filter itself stays, so bloom
  * false positives re-check and answers never change.
  *
  * Mechanics (same extension point as [[AggProjections]] /
  * [[NormalProjections]]): an extraOptimizations rule matches
  * Filter-over-LogicalRelation plans whose relation roots at a registered
  * data dir, extracts equality/IN conjuncts on indexed columns, consults
  * the driver-resident index (|files| rows), and swaps the relation's
  * location for an [[InMemoryFileIndex]] over the surviving files. After
  * the swap the root paths no longer match the registry, so the rule
  * cannot re-fire on its own output.
  */
object SkipIndexPruning {

  final case class Idx(dataPath: String, indexDir: String, columns: Set[String])

  private val registry = new ConcurrentHashMap[String, Idx]()

  private def canon(p: String): String =
    new org.apache.hadoop.fs.Path(p).toUri.getPath

  /** Register a bloom index (built with [[SkipIndex.create]]) for
    * transparent use and install the rule. */
  def register(spark: SparkSession, dataDir: String, indexDir: String,
      columns: Seq[String]): Unit = {
    registry.put(canon(dataDir), Idx(canon(dataDir), indexDir, columns.toSet))
    install(spark)
  }

  def drop(dataDir: String): Unit = registry.remove(canon(dataDir))

  private val installed =
    java.util.Collections.newSetFromMap(
      new java.util.WeakHashMap[SparkSession, java.lang.Boolean])

  def install(spark: SparkSession): Unit = synchronized {
    if (!installed.contains(spark)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PruneRule(spark)
      installed.add(spark)
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  case class PruneRule(spark: SparkSession) extends Rule[LogicalPlan] {

    /** (probe hashes per indexed column) from the supported conjuncts. */
    private def probes(cond: Expression, idx: Idx): Map[String, Seq[Long]] =
      conjuncts(cond).flatMap {
        case EqualTo(a: AttributeReference, l: Literal)
            if idx.columns.contains(a.name) && l.value != null =>
          Some(a.name -> Seq(SkipIndex.hashOfLiteral(l)))
        case EqualTo(l: Literal, a: AttributeReference)
            if idx.columns.contains(a.name) && l.value != null =>
          Some(a.name -> Seq(SkipIndex.hashOfLiteral(l)))
        case In(a: AttributeReference, vs)
            if idx.columns.contains(a.name) &&
              vs.forall(v => v.isInstanceOf[Literal] &&
                v.asInstanceOf[Literal].value != null) =>
          Some(a.name -> vs.map(v =>
            SkipIndex.hashOfLiteral(v.asInstanceOf[Literal])))
        case InSet(a: AttributeReference, hset)
            if idx.columns.contains(a.name) && !hset.contains(null) =>
          Some(a.name -> hset.toSeq.map(v =>
            SkipIndex.hashOfLiteral(Literal.create(v, a.dataType))))
        case _ => None
      }.groupBy(_._1).map { case (c, kvs) =>
        // multiple conjuncts on one column: each must pass → intersect later
        c -> kvs.map(_._2)
      }.map { case (c, hashLists) => c -> hashLists }
        .flatMap { case (c, hashLists) =>
          // a column constrained twice (rare) keeps the FIRST probe set;
          // correctness is safe either way (pruning is a superset filter)
          hashLists.headOption.map(c -> _)
        }

    private def prunedFiles(idx: Idx, byColumn: Map[String, Seq[Long]]): Seq[String] =
      byColumn.map { case (c, hashes) =>
        SkipIndex.matchingFilesByHash(spark, idx.indexDir, c, hashes).toSet
      }.reduce(_ intersect _).toSeq.sorted

    override def apply(plan: LogicalPlan): LogicalPlan = {
      if (registry.isEmpty) return plan
      plan.transformUp {
        case f @ Filter(cond, child) =>
          val rewritten = rewriteScan(child, cond)
          rewritten.map(c => Filter(cond, c)).getOrElse(f)
      }
    }

    /** Rewrite the scan under (possibly) a column-pruning Project. */
    private def rewriteScan(plan: LogicalPlan, cond: Expression): Option[LogicalPlan] =
      plan match {
        case p @ Project(projectList, child)
            if projectList.forall(_.isInstanceOf[AttributeReference]) =>
          rewriteScan(child, cond).map(c => p.copy(child = c))
        case lr: LogicalRelation => lr.relation match {
          case fs: HadoopFsRelation =>
            val roots = fs.location.rootPaths.map(p => canon(p.toString))
            val idxOpt = roots.iterator.map(registry.get).find(_ != null)
            idxOpt.flatMap { idx =>
              val byColumn = probes(cond, idx)
              if (byColumn.isEmpty) None
              else {
                val files = prunedFiles(idx, byColumn)
                val total = fs.location.inputFiles.length
                if (files.size >= total) None
                else {
                  val newLocation = new InMemoryFileIndex(spark,
                    files.map(new org.apache.hadoop.fs.Path(_)),
                    Map.empty, Some(fs.dataSchema))
                  val newFs = fs.copy(location = newLocation)(spark)
                  Some(lr.copy(relation = newFs))
                }
              }
            }
          case _ => None
        }
        case _ => None
      }
  }
}
