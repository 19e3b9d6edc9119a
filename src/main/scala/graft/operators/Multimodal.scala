package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for the training-data pipeline: media as
  * opaque `binary` columns with a typed metadata struct, decoded /
  * feature-extracted per partition.
  *
  * The decode itself is a STUB (no image/audio codecs ship in this
  * environment): `decodeStub` derives deterministic fake dimensions and a
  * 16-bin byte histogram from the payload bytes. Everything around it —
  * schema, batch shape (one partition = one decode batch), partitioning,
  * and the Dataset lineage — is the real 100 TB design: binary payloads
  * never shuffle (decode happens before any wide transform), and features
  * are fixed-width arrays ready for the similarity-search operators.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(
      doc_id: Long, kind: String, width: Int, height: Int,
      mean_intensity: Double, histogram: Array[Double])

  /** Wrap a text corpus as a fake media table: payload = utf-8 bytes,
    * kind cycled deterministically. Stand-in for `spark.read.format
    * ("binaryFile")` over an object store. */
  def asMediaTable(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaRow]
  }

  /** ??? real codec goes here — deterministic fake decode of the payload.
    * Runs once per partition iterator (the mapPartitions batch shape a
    * native decoder with per-batch setup cost needs). */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition "codec init" would happen here
      rows.map { r =>
        val bytes = r.payload
        val w = 16 + math.abs(bytes.length % 48)          // fake width
        val h = 16 + math.abs((bytes.length / 7) % 48)    // fake height
        val hist = new Array[Double](16)
        var sum = 0L
        var i = 0
        while (i < bytes.length) {
          val v = bytes(i) & 0xff
          hist(v / 16) += 1.0
          sum += v
          i += 1
        }
        val n = math.max(bytes.length, 1)
        MediaFeatures(r.doc_id, r.kind, w, h, sum.toDouble / n,
          hist.map(_ / n))
      }
    }
  }

  /** Full pipeline: docs → media table → decoded features, repartitioned on
    * doc_id so downstream joins co-locate with the documents table. */
  def featureTable(spark: SparkSession, dir: String): DataFrame = {
    val docs = graft.Tables.load(spark, dir, "documents")
    decodeStub(asMediaTable(docs)).toDF()
  }
}
