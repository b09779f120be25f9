package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY.md §2.C): image/audio/video as opaque
  * `binary` columns with typed metadata, decode / feature-extract /
  * frame-sample as partition-batched transforms.
  *
  * The Spark-side plumbing — schemas, encoders, partition batching, fan-out
  * shape — is real and tested. The pixel/sample DECODE STEP IS A STUB
  * (`StubCodec`): this container has no image/audio libraries, so it derives
  * deterministic fake dimensions from the byte stream. Swapping in a real
  * codec changes only the body of `StubCodec.decode`, nothing in the
  * dataflow.
  *
  * Scale notes: blobs ride through the scan as binary columns (parquet keeps
  * them out of dictionary encoding); decode is `mapPartitions`, so per-batch
  * library init (codec contexts, GPU handles) amortises across a partition —
  * the same shape a Pandas-UDF `mapInPandas` pipeline has in PySpark. Size
  * partitions by bytes (`spark.sql.files.maxPartitionBytes`), not rows,
  * when blobs dominate.
  */
object Multimodal {

  /** One media asset: the opaque payload + declared container format. */
  final case class MediaRow(media_id: Long, format: String, blob: Array[Byte])

  /** Decode output: typed metadata + a fixed-width feature vector. */
  final case class DecodedRow(
      media_id: Long, format: String, width: Int, height: Int,
      channels: Int, n_bytes: Long, features: Array[Float])

  /** One sampled frame of a (fake-)video asset. */
  final case class FrameRow(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** THE STUB: deterministic pseudo-decode. A real build replaces this
    * object with a codec-backed implementation (javax.imageio / ffmpeg
    * bindings); everything downstream keeps its schema.
    */
  object StubCodec {
    def decode(format: String, blob: Array[Byte]): (Int, Int, Int) = {
      val n = blob.length
      val width = (n % 640) + 1
      val height = ((n * 7) % 480) + 1
      val channels = if (format == "png") 4 else 3
      (width, height, channels)
    }

    /** 16-bucket byte-mean "embedding" — real arithmetic over the payload
      * (only the pixel interpretation is fake).
      */
    def features(blob: Array[Byte], dims: Int = 16): Array[Float] = {
      if (blob.isEmpty) return Array.fill(dims)(0f)
      val out = new Array[Float](dims)
      val counts = new Array[Int](dims)
      var i = 0
      while (i < blob.length) {
        val b = i * dims / blob.length
        out(b) += (blob(i) & 0xff)
        counts(b) += 1
        i += 1
      }
      var d = 0
      while (d < dims) { if (counts(d) > 0) out(d) /= counts(d); d += 1 }
      out
    }
  }

  /** Fake a media table from the documents table: UTF-8 payload bytes with a
    * round-robin container format. (Stands in for `spark.read.format
    * ("binaryFile")` or a parquet table with a binary column.)
    */
  def mediaTable(documents: DataFrame): DataFrame =
    documents.select(
      col("doc_id").as("media_id"),
      element_at(array(lit("png"), lit("jpeg"), lit("webm")),
        (col("doc_id") % 3 + 1).cast("int")).as("format"),
      encode(col("text"), "UTF-8").as("blob"))

  /** Partition-batched decode: one iterator pass per partition, codec init
    * amortised (the `StubCodec` stands where a per-partition
    * `ImageIO`/`avcodec` context would be created once).
    */
  def decodeAll(media: Dataset[MediaRow]): Dataset[DecodedRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // real impl: init codec context here, once per partition
      rows.map { r =>
        val (w, h, c) = StubCodec.decode(r.format, r.blob)
        DecodedRow(r.media_id, r.format, w, h, c, r.blob.length.toLong,
          StubCodec.features(r.blob))
      }
    }
  }

  def toMedia(df: DataFrame): Dataset[MediaRow] = {
    import df.sparkSession.implicits._
    df.select(col("media_id"), col("format"), col("blob")).as[MediaRow]
  }

  /** Frame sampling for "video" rows: every `stride`-th 64-byte slice
    * becomes a frame — the 1:N fan-out shape of real frame extraction
    * (flatMap keeps it pipelined; no shuffle).
    */
  def sampleFrames(media: Dataset[MediaRow], stride: Int = 4): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.filter(_.format == "webm").flatMap { r =>
      val frameSize = 64
      val n = math.max(r.blob.length / frameSize, 1)
      (0 until n by stride).map { i =>
        val from = i * frameSize
        FrameRow(r.media_id, i,
          r.blob.slice(from, math.min(from + frameSize, r.blob.length)))
      }
    }
  }

  /** "Resize": metadata-level transform (the pixel op is the stub's job);
    * keeps aspect ratio within a bounding box.
    */
  def resizeMeta(decoded: Dataset[DecodedRow], maxW: Int, maxH: Int): DataFrame = {
    val scale = least(lit(maxW).cast("double") / col("width"),
      lit(maxH).cast("double") / col("height"), lit(1.0))
    decoded.toDF()
      .withColumn("resized_w", floor(col("width") * scale).cast("int"))
      .withColumn("resized_h", floor(col("height") * scale).cast("int"))
  }

  /** The full decode pipeline as a query (used by x12). */
  def decodePipeline(spark: SparkSession, documents: DataFrame): DataFrame =
    decodeAll(toMedia(mediaTable(documents))).toDF()
}
