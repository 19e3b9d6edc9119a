package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Native Hudi copy-on-write READ — the reference's
  * HudiMetadata::getDataFilesImpl semantics re-expressed: Hudi base
  * files are named `[FileId]_[WriteToken]_[Timestamp].parquet`, a
  * copy-on-write update rewrites a whole file group under a new
  * timestamp, so the current table state is the LATEST-timestamped
  * file per (partition, file id) — selected from the file listing
  * alone, exactly as the reference does. Merge-on-read tables (`.log.`
  * delta files) reject loudly: serving base files while ignoring
  * un-compacted deltas would be silently stale.
  */
object HudiSource {

  def read(spark: SparkSession, tablePath: String): DataFrame = {
    val root = new Path(tablePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(new Path(root, ".hoodie")),
      s"hudi: $tablePath has no .hoodie directory — not a Hudi table")
    val files = scala.collection.mutable.ArrayBuffer.empty[Path]
    def walk(p: Path): Unit = fs.listStatus(p).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith(".") || n.startsWith("_")) {
        // metadata dirs skipped — but a MoR delta log anywhere is loud
        if (n.contains(".log.")) throw new IllegalArgumentException(
          "hudi: merge-on-read log files present — this native reader " +
            "serves copy-on-write tables only (compact first)")
      }
      else if (st.isDirectory) walk(st.getPath)
      else if (n.contains(".log.")) throw new IllegalArgumentException(
        "hudi: merge-on-read log files present — this native reader " +
          "serves copy-on-write tables only (compact first)")
      else if (n.endsWith(".parquet")) files += st.getPath
    }
    walk(root)
    require(files.nonEmpty, s"hudi: no base files under $tablePath")
    // (partition dir, fileId) → latest-timestamp file
    // name stem = fileId _ writeToken _ timestamp
    val latest = scala.collection.mutable.Map.empty[(String, String), (Long, String)]
    files.foreach { p =>
      val stem = p.getName.stripSuffix(".parquet")
      val parts = stem.split('_')
      require(parts.length == 3,
        s"hudi: unexpected base-file name ${p.getName} " +
          "(expected fileId_writeToken_timestamp.parquet)")
      val key = (p.getParent.toString, parts(0))
      // instant stems may carry a millisecond suffix — and instants of
      // MIXED precision can share one file group (14-digit second
      // instants from an old writer, 17-digit millisecond instants from
      // a new one). Compare on a fixed width: second-precision instants
      // pad to milliseconds with '000', so 20240102000000 ranks below
      // 20240102000000500 instead of always losing to any 17-digit
      // value numerically.
      val digits = parts(2).takeWhile(_.isDigit)
      require(digits.nonEmpty,
        s"hudi: base-file name ${p.getName} has no instant timestamp")
      val ts = (if (digits.length < 17) digits + "0" * (17 - digits.length)
        else digits).toLong
      if (!latest.get(key).exists(_._1 >= ts))
        latest(key) = (ts, p.toString)
    }
    spark.read.parquet(latest.values.map(_._2).toSeq: _*)
  }
}
