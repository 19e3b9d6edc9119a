package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, EqualNullSafe, EqualTo, Expression, In, InSet, Literal, Or}
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, PartitionDirectory}
import org.apache.spark.sql.types.StructType

import graft.sources.IcebergTransforms.IcePartField

/** PLANNING-TIME manifest pruning for Iceberg scans — the Spark-native
  * analog of the reference's ManifestFilesPruning: a custom
  * [[FileIndex]] whose `listFiles` evaluates the query's pushed data
  * filters against each data file's recorded partition tuple, so
  * `SELECT … FROM iceberg('t') WHERE id = 34` on a `bucket(4, id)`
  * table (or `WHERE ts = X` on a `day(ts)` table) scans ONLY the
  * matching files — automatically, from the predicate, with no
  * explicit prune parameter. The static `pruneSource`/`partitionEq`
  * read arguments still apply first (they shrink this index's file
  * list); this index adds the dynamic lane on top.
  *
  * Supported filter shapes (everything else ADMITS — keep is always
  * safe): `col = lit` (both orders), `col <=> lit`, `col IN (lits)`,
  * and AND/OR combinations. Literal rendering and transform
  * evaluation are the SAME code as the static lane
  * (IcebergTransforms.tupleAdmitsSource), so the two can never
  * disagree. The index is file-count-sized driver metadata — the same
  * scale as the manifests it derives from.
  */
final class IcebergManifestFileIndex(
    files: Seq[(FileStatus, Option[Map[String, Option[String]]])],
    fields: Seq[IcePartField]) extends FileIndex {

  override def rootPaths: Seq[Path] =
    files.map(_._1.getPath.getParent).distinct

  override def partitionSchema: StructType = StructType(Nil)

  override def inputFiles: Array[String] =
    files.map(_._1.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = files.map(_._1.getLen).sum

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept =
      if (fields.isEmpty || dataFilters.isEmpty) files
      else files.filter { case (_, tuple) =>
        dataFilters.forall(f => admits(f, tuple))
      }
    Seq(PartitionDirectory(InternalRow.empty,
      kept.map { case (st, _) => FileStatusWithMetadata(st) }))
  }

  /** May the file described by `tuple` contain rows satisfying `e`?
    * Conservative: anything unrecognized admits. */
  private def admits(e: Expression,
      tuple: Option[Map[String, Option[String]]]): Boolean = e match {
    case And(l, r) => admits(l, tuple) && admits(r, tuple)
    case Or(l, r) => admits(l, tuple) || admits(r, tuple)
    case EqualTo(a: AttributeReference, l: Literal) => eqAdmits(a, l, tuple)
    case EqualTo(l: Literal, a: AttributeReference) => eqAdmits(a, l, tuple)
    case EqualNullSafe(a: AttributeReference, l: Literal) =>
      eqAdmits(a, l, tuple)
    case EqualNullSafe(l: Literal, a: AttributeReference) =>
      eqAdmits(a, l, tuple)
    case In(a: AttributeReference, ls) if ls.forall(_.isInstanceOf[Literal]) =>
      ls.exists(l => eqAdmits(a, l.asInstanceOf[Literal], tuple))
    case InSet(a: AttributeReference, vs) =>
      vs.exists(v => eqAdmits(a, Literal(v, a.dataType), tuple))
    case _ => true
  }

  private def eqAdmits(a: AttributeReference, l: Literal,
      tuple: Option[Map[String, Option[String]]]): Boolean =
    IcebergTransforms.rawOfLiteral(l.value, l.dataType) match {
      case None => true // null or an unevaluated literal type — keep
      case Some(raw) =>
        IcebergTransforms.tupleAdmitsSource(tuple, fields, a.name, raw)
    }
}
