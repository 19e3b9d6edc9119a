package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{And, AttributeReference, BoundReference, Expression, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, FileStatusWithMetadata, PartitionDirectory}
import org.apache.spark.sql.types.StructType

/** A [[FileIndex]] over an EXPLICIT file list with per-file partition
  * values known up front — the scan shape of log-driven table formats
  * (Delta stores partitionValues in the transaction log, not in the
  * files or directory names). Declaring the partition schema here puts
  * the format on Spark's native partitioned-scan machinery:
  *
  *  - partition COLUMNS are attached to output rows by the scan itself
  *    (no broadcast join from input_file_name() in the plan);
  *  - partition FILTERS prune whole files at planning time (the
  *    standard InMemoryFileIndex pruning contract: `listFiles` binds
  *    the filters against each directory's values row);
  *  - `spark.sql.optimizer.dynamicPartitionPruning` and AQE treat the
  *    scan like any hive-partitioned source.
  *
  * `partitions` = one entry per distinct partition tuple: the typed
  * values row (catalyst representations, in `partitionSchema` field
  * order) and that tuple's files. */
final class PartitionedListFileIndex(
    partitions: Seq[(InternalRow, Seq[FileStatus])],
    override val partitionSchema: StructType) extends FileIndex {

  override def rootPaths: Seq[Path] =
    partitions.flatMap(_._2).map(_.getPath.getParent).distinct

  override def inputFiles: Array[String] =
    partitions.flatMap(_._2).map(_.getPath.toString).toArray

  override def refresh(): Unit = ()

  override def sizeInBytes: Long =
    partitions.flatMap(_._2).map(_.getLen).sum

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val kept =
      if (partitionFilters.isEmpty || partitionSchema.isEmpty) partitions
      else {
        // the standard partition-pruning binding (what
        // InMemoryFileIndex does): resolve each attribute to its
        // ordinal in the values row, evaluate per partition
        val predicate = partitionFilters.reduce(And)
        val bound = Predicate.create(predicate.transform {
          case a: AttributeReference =>
            val i = partitionSchema.fieldNames.indexWhere(_ == a.name)
            require(i >= 0,
              s"partition filter references unknown column ${a.name}")
            BoundReference(i, partitionSchema.fields(i).dataType,
              nullable = true)
        }, Nil)
        partitions.filter { case (values, _) => bound.eval(values) }
      }
    kept.map { case (values, files) =>
      PartitionDirectory(values, files.map(FileStatusWithMetadata(_)))
    }
  }
}
