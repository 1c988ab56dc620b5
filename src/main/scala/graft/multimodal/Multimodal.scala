package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing for training-data pipelines: media
  * payloads ride as opaque `binary` columns next to a typed metadata
  * struct; decode / feature-extract / frame-sample run as distributed
  * transforms over the bytes.
  *
  * The actual media codecs are STUBBED (this container ships no
  * image/audio libraries): `decodeStub` derives deterministic fake
  * dimensions from the byte stream and `frameSample` slices raw bytes
  * as stand-in frames. The Spark-side plumbing — binary schema,
  * metadata struct, partition-parallel typed traversal, batch shapes —
  * is real and tested; swapping in a real decoder only replaces the
  * byte->features function.
  */
object Multimodal {

  /** Media row: opaque payload + typed metadata. */
  case class MediaRow(doc_id: Long, mime: String, n_bytes: Long, payload: Array[Byte])
  case class Frame(doc_id: Long, frame_idx: Int, bytes: Array[Byte])

  /** Build a media table from the documents corpus: the UTF-8 bytes of
    * `text` stand in for an encoded media payload. */
  def mediaTable(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(
        col("doc_id"),
        lit("application/octet-stream").as("mime"),
        encode(col("text"), "UTF-8").as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))

  /** STUB decoder: deterministic fake width/height/channels derived
    * from the payload length (??? -> a real decoder would parse the
    * container header here). Pure Column math so it stays in codegen. */
  def decodeStub(df: DataFrame): DataFrame =
    df.withColumn("decoded", struct(
      (col("n_bytes") % 640 + 1).cast("int").as("width"),
      (col("n_bytes") % 480 + 1).cast("int").as("height"),
      lit(3).as("channels")))

  /** STUB feature extraction: 8-bin histogram over payload bytes —
    * the byte-level plumbing a real embedding/feature kernel would use
    * (per-element traversal of the binary column, fixed-size output). */
  def byteHistogram(df: DataFrame): DataFrame = {
    // binary -> hex -> pairs -> ints, pure Column ops
    val hexStr = lower(org.apache.spark.sql.functions.hex(col("payload")))
    val bytePairs = regexp_extract_all(hexStr, lit("[0-9a-f]{2}"), lit(0))
    val bins = transform(bytePairs, p =>
      (conv(p, 16, 10).cast("int") / lit(32)).cast("int"))
    val hist = transform(sequence(lit(0), lit(7)), b =>
      size(filter(bins, x => x === b)))
    df.withColumn("byte_hist", hist)
  }

  /** Frame sampling via typed partition-parallel traversal: payload
    * sliced into fixed-width "frames", every `stride`-th kept. The
    * mapPartitions shape (iterator in/iterator out, no driver
    * collect) is exactly what a real video frame sampler needs. */
  def frameSample(media: Dataset[MediaRow], frameBytes: Int, stride: Int): Dataset[Frame] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      m.payload.grouped(frameBytes).zipWithIndex.collect {
        case (bytes, i) if i % stride == 0 => Frame(m.doc_id, i, bytes)
      }
    })
  }
}
