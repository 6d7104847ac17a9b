package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * The Spark-side contract is real and tested — schema, partitioning,
  * batch shape (mapPartitions over iterator, one decode call per row,
  * reusable per-partition scratch) — while the actual codec call is a
  * clearly-marked deterministic STUB (no image/audio libraries in this
  * environment). Swapping in a real decoder changes only the body of
  * [[decodeStub]]; at 100 TB the decode stage is a narrow map (no
  * shuffle) and parallelizes with input splits.
  */
object Multimodal {

  /** Typed media column: payload + metadata, the schema every media
    * operator consumes. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("bytes", BinaryType),
    StructField("mime", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Pack raw bytes + metadata into the media struct. */
  def mediaStruct(bytes: Column, mime: Column, width: Column, height: Column, nFrames: Column): Column =
    struct(bytes.as("bytes"), mime.as("mime"), width.cast("int").as("width"),
      height.cast("int").as("height"), nFrames.cast("int").as("n_frames"))

  /** Byte-level features that need no decode — pure built-ins. */
  def byteLength(media: Column): Column = octet_length(media.getField("bytes"))
  def contentHash(media: Column): Column = md5(media.getField("bytes"))

  /** STUB decoder: a real implementation would call an image codec here
    * (e.g. ImageIO/libjpeg) and emit pixel statistics. The stub derives a
    * deterministic feature vector from the payload bytes so the full
    * pipeline — schema in, features out, partition-parallel — is
    * exercised end-to-end and its results are reproducible. */
  private[llm] def decodeStub(bytes: Array[Byte], dims: Int): Array[Double] = {
    // ??? <- real codec goes here; deterministic fake below
    val out = new Array[Double](dims)
    var i = 0
    while (i < bytes.length) {
      out(i % dims) += (bytes(i) & 0xFF).toDouble / 255.0
      i += 1
    }
    out
  }

  /** Decode + feature-extract over a DataFrame with a media struct
    * column: mapPartitions (one pass, no shuffle), emitting
    * (idCol, features array<double>). `dims` is the feature width. */
  def extractFeatures(df: DataFrame, idCol: String, mediaCol: String, dims: Int = 8): DataFrame = {
    val sel = df.select(col(idCol), col(mediaCol).getField("bytes").as("__bytes"))
    val outSchema = StructType(Seq(
      sel.schema.head,
      StructField("features", ArrayType(DoubleType, containsNull = false))))
    sel.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        Row(r.get(0), decodeStub(if (bytes == null) Array.emptyByteArray else bytes, dims).toSeq)
      }
    }(Encoders.row(outSchema))
  }

  /** Frame sampling for video-like payloads: every `stride`-th chunk of
    * `frameBytes` bytes becomes a frame payload row (exploded). Pure
    * built-ins — the chunking is the real plumbing; decoding each frame
    * would reuse [[extractFeatures]]. */
  def sampleFrames(df: DataFrame, idCol: String, mediaCol: String, frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val bytes = col(mediaCol).getField("bytes")
    val nFrames = floor(octet_length(bytes) / frameBytes).cast("int")
    df.select(col(idCol), posexplode(
        transform(sequence(lit(0), greatest(nFrames - 1, lit(0)), lit(stride)),
          i => bytes.substr(i * lit(frameBytes) + 1, lit(frameBytes)))).as(Seq("frame_idx", "frame")))
  }
}
