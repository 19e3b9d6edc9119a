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

  case class FrameRow(doc_id: Long, frame_idx: Int, frame_payload: Array[Byte])

  /** Frame sampling for video payloads: every `every`-th fixed-size chunk
    * becomes a frame row (??? a real codec seeks keyframes here — the
    * deterministic chunking is the stub). flatMap keeps the row-expanding
    * generator shape; frames inherit the parent row's partition, so the
    * binary payload still never shuffles pre-decode. */
  def frameSample(media: Dataset[MediaRow], every: Int,
      frameBytes: Int): Dataset[FrameRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex.collect {
        case (chunk, idx) if idx % every == 0 => FrameRow(r.doc_id, idx, chunk)
      }
    }
  }

  /** Resize stage: rebin the 16-bucket intensity histogram down to `bins`
    * (??? a real impl resamples pixels; rebinning is the
    * dimension-reduction stub). Mass-preserving: the rebinned histogram
    * sums to the original's total. */
  def resizeFeatures(features: Dataset[MediaFeatures], bins: Int): DataFrame = {
    require(16 % bins == 0, "bins must divide 16")
    val group = 16 / bins
    features.toDF().withColumn("histogram",
      transform(sequence(lit(0), lit(bins - 1)), b =>
        aggregate(slice(col("histogram"), b * group + 1, lit(group)),
          lit(0.0), (acc, x) => acc + x)))
  }
}
