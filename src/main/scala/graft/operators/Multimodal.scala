package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: opaque `binary` payloads + typed metadata
  * structs, with batch feature extraction over `mapPartitions`.
  *
  * Parquet stores binary natively, so 100 TB of media payloads ride the same
  * scan/pruning machinery as everything else (including the pjparquet
  * metadata-spliced planning — binary chunks are just chunks). The decode
  * step is a STUB: this container has no image/audio codecs, so a
  * deterministic byte-histogram stands in for "decode + embed"; the
  * Spark-side plumbing — schema, batch iteration, partition preservation,
  * feature shapes — is real and tested.
  */
object Multimodal {

  val FeatureBins = 16

  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_bytes", LongType, nullable = true)))

  /** Wrap a text corpus as fake media rows: payload = utf8 bytes (a
    * deterministic stand-in for image bytes), meta = typed struct. Real
    * pipelines land here straight from ingestion.
    */
  def packAsMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("source"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("application/x-fake").as("mime"),
        (length(col("text")) % 640).cast("int").as("width"),
        (length(col("text")) % 480).cast("int").as("height"),
        length(col("text")).cast("long").as("n_bytes")).as("meta"))

  /** Batch feature extraction: one pass per partition, rows processed in
    * iterator order (the JVM analogue of a `mapInPandas` batch UDF). Output
    * schema: media_id, source, features array<float>[FeatureBins].
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("source", StringType, nullable = true),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = Encoders.row(outSchema)
    media.select(col("media_id"), col("source"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          Row(r.getAs[Long]("media_id"), r.getAs[String]("source"), decodeStub(payload))
        }
      }(enc)
  }

  /** STUB decode: a real deployment calls the image/audio codec here
    * (`???` boundary). Deterministic byte histogram, L1-normalized — keeps
    * tests meaningful without native libs.
    */
  private def decodeStub(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](FeatureBins)
    if (payload == null || payload.isEmpty) return bins
    var i = 0
    while (i < payload.length) {
      bins((payload(i) & 0xff) % FeatureBins) += 1f
      i += 1
    }
    var b = 0
    while (b < FeatureBins) { bins(b) /= payload.length.toFloat; b += 1 }
    bins
  }

  /** Batch "resize": nearest-neighbor byte downsample of each payload to at
    * most `targetBytes`, meta rewritten to the new size (the stand-in for an
    * image resize — a real deployment swaps the sampler for the codec's
    * scaler at the same `???` boundary as [[extractFeatures]]). Same batch
    * shape as decode: one `mapPartitions` pass, no shuffle, schema
    * preserved.
    */
  def resize(media: DataFrame, targetBytes: Int): DataFrame = {
    require(targetBytes > 0)
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("source", StringType, nullable = true),
      StructField("payload", BinaryType, nullable = true),
      StructField("meta", mediaMetaType, nullable = true)))
    val enc = Encoders.row(schema)
    media.select(col("media_id"), col("source"), col("payload"), col("meta"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val resized =
            if (payload == null || payload.length <= targetBytes) payload
            else Array.tabulate(targetBytes)(i =>
              payload((i.toLong * payload.length / targetBytes).toInt))
          val meta = r.getAs[Row]("meta")
          val newMeta =
            if (meta == null || resized == null) meta
            else Row(meta.getAs[String]("mime"), meta.getAs[Integer]("width"),
              meta.getAs[Integer]("height"), resized.length.toLong)
          Row(r.getAs[Long]("media_id"), r.getAs[String]("source"), resized, newMeta)
        }
      }(enc)
  }

  /** Frame sampling for "video" payloads: every `stride`-th fixed-size block
    * as its own binary frame — pure byte plumbing, runs wherever the row
    * lives (no shuffle).
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    val frames = transform(
      sequence(lit(0),
        greatest((floor(length(col("payload")) / (frameBytes * stride)) - 1).cast("int"), lit(0))),
      i => col("payload").substr(i * frameBytes * stride + 1, lit(frameBytes)))
    media.withColumn("frames", frames)
  }
}
