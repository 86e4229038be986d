package graft.operators

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: opaque `binary` payloads + typed metadata
  * structs, with batch decode / feature-extraction / resize over
  * `mapPartitions`.
  *
  * Parquet stores binary natively, so 100 TB of media payloads ride the same
  * scan/pruning machinery as everything else (including the pjparquet
  * metadata-spliced planning — binary chunks are just chunks). Image
  * payloads are REAL: encoded and decoded with the JDK's `javax.imageio`
  * PNG codec (no external deps, deterministic output). Unknown MIME types
  * fall back to a deterministic byte histogram so the pipeline never fails
  * on a payload it cannot decode.
  */
object Multimodal {

  val FeatureBins = 16

  val mediaMetaType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("n_bytes", LongType, nullable = true)))

  // ImageIO defaults to a temp-FILE cache per stream — executor-local disk
  // I/O per row. Memory-cached streams only.
  ImageIO.setUseCache(false)

  /** Render a deterministic PNG from a byte string: dimensions derive from
    * the content length, pixels cycle through the content bytes as RGB.
    * Same bytes → same image → byte-identical PNG (the JDK PNG writer emits
    * no timestamps).
    */
  private[operators] def renderPng(bytes: Array[Byte]): (Array[Byte], Int, Int) = {
    val w = 8 + (bytes.length % 24)
    val h = 8 + ((bytes.length / 24) % 16)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val n = math.max(1, bytes.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = (y * w + x) * 3
        def b(j: Int): Int = if (bytes.isEmpty) 0 else bytes(j % n) & 0xff
        img.setRGB(x, y, (b(i) << 16) | (b(i + 1) << 8) | b(i + 2))
        x += 1
      }
      y += 1
    }
    val out = new ByteArrayOutputStream(w * h)
    ImageIO.write(img, "png", out)
    (out.toByteArray, w, h)
  }

  /** Wrap a text corpus as real media rows: payload = a PNG rendered from
    * the utf8 bytes (deterministic stand-in for ingested images; the codec
    * path is the real `javax.imageio` one), meta = typed struct. Real
    * pipelines land here straight from ingestion.
    */
  def packAsMedia(docs: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("source", StringType, nullable = true),
      StructField("payload", BinaryType, nullable = true),
      StructField("meta", mediaMetaType, nullable = true)))
    val enc = Encoders.row(schema)
    docs.select(col("doc_id").as("media_id"), col("source"), col("text"))
      .mapPartitions { rows =>
        // positional access: rows from upstream narrow stages may carry no
        // schema (select order above is media_id, source, text)
        rows.map { r =>
          val (png, w, h) = renderPng(
            r.getString(2).getBytes(java.nio.charset.StandardCharsets.UTF_8))
          Row(r.getLong(0), r.getString(1), png, Row("image/png", w, h, png.length.toLong))
        }
      }(enc)
  }

  /** Batch feature extraction: one pass per partition, rows processed in
    * iterator order (the JVM analogue of a `mapInPandas` batch UDF).
    *
    * Image-MIME payloads are decoded with `javax.imageio` and featurized as
    * an L1-normalized luminance histogram, with the decoded dimensions
    * reported; other MIME types (or undecodable payloads) fall back to the
    * deterministic byte histogram with null dimensions. Output schema:
    * media_id, source, meta, features array<float>[FeatureBins], width,
    * height.
    */
  def extractFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("source", StringType, nullable = true),
      StructField("meta", mediaMetaType, nullable = true),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true)))
    val enc = Encoders.row(outSchema)
    media.select(col("media_id"), col("source"), col("payload"), col("meta"))
      .mapPartitions { rows =>
        // positional access (select order: media_id, source, payload, meta;
        // meta struct: mime, width, height, n_bytes) — upstream narrow
        // stages may hand over schema-less rows
        rows.map { r =>
          val payload = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          val meta = if (r.isNullAt(3)) null else r.getStruct(3)
          val mime = if (meta == null || meta.isNullAt(0)) "" else meta.getString(0)
          val decoded = if (mime.startsWith("image/")) decodeImage(payload) else None
          decoded match {
            case Some(img) =>
              Row(r.getLong(0), r.getString(1), meta,
                luminanceHistogram(img), Integer.valueOf(img.getWidth), Integer.valueOf(img.getHeight))
            case None =>
              Row(r.getLong(0), r.getString(1), meta, byteHistogram(payload), null, null)
          }
        }
      }(enc)
  }

  /** 64-bit difference hash (dHash) of a decoded image: luminance plane,
    * area-averaged down to a 9×8 grid, bit (x, y) = cell(x,y) > cell(x+1,y)
    * — the classic perceptual fingerprint (resize-invariant by
    * construction, robust to re-encoding). Identical pixels → identical
    * hash, always; visually-near images land within small Hamming
    * distance. Integer arithmetic only (sums of luminance over exact pixel
    * partitions), so the hash is engine- and platform-exact.
    */
  private[operators] def dHash64(img: BufferedImage): Long = {
    val gw = 9
    val gh = 8
    val w = img.getWidth
    val h = img.getHeight
    // integer area sums over the exact partition [x*w/gw, (x+1)*w/gw)
    val sums = new Array[Long](gw * gh)
    val cnts = new Array[Long](gw * gh)
    var y = 0
    while (y < h) {
      val gy = math.min(gh - 1, y * gh / h)
      var x = 0
      while (x < w) {
        val gx = math.min(gw - 1, x * gw / w)
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
        sums(gy * gw + gx) += lum
        cnts(gy * gw + gx) += 1
        x += 1
      }
      y += 1
    }
    var bits = 0L
    var gy = 0
    while (gy < gh) {
      var gx = 0
      while (gx < gw - 1) {
        // exact cross-multiplied compare: sumA/cntA > sumB/cntB
        val a = gy * gw + gx
        val b = a + 1
        if (sums(a) * cnts(b) > sums(b) * cnts(a))
          bits |= 1L << (gy * (gw - 1) + gx)
        gx += 1
      }
      gy += 1
    }
    bits
  }

  /** Append a `dhash` column (64-bit perceptual hash, null when the
    * payload does not decode as an image) plus a `payload_md5` exactness
    * key — one `mapPartitions` decode pass, after which downstream dedup
    * never touches the payload bytes again (the 100 TB point: candidate
    * generation and verification shuffle 40-byte keys, not media).
    */
  def withImageDHash(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("source", StringType, nullable = true),
      StructField("dhash", LongType, nullable = true),
      StructField("payload_md5", StringType, nullable = true)))
    val enc = Encoders.row(outSchema)
    media.select(col("media_id"), col("source"), col("payload"), col("meta"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          val meta = if (r.isNullAt(3)) null else r.getStruct(3)
          val mime = if (meta == null || meta.isNullAt(0)) "" else meta.getString(0)
          val decoded = if (mime.startsWith("image/")) decodeImage(payload) else None
          decoded match {
            case Some(img) =>
              val md5 = java.security.MessageDigest.getInstance("MD5").digest(payload)
              Row(r.getLong(0), r.getString(1), dHash64(img),
                md5.map("%02x".format(_)).mkString)
            case None => Row(r.getLong(0), r.getString(1), null, null)
          }
        }
      }(enc)
  }

  /** Perceptual image dedup, candidate-generate → verify: dHash equality
    * proposes candidate pairs (a 64-bit bucket join — identical pixels can
    * NEVER be missed because identical payloads hash identically), and
    * payload-md5 equality verifies which candidates are exact duplicates.
    * Input is [[withImageDHash]] output; result is one row per candidate
    * pair `(a, b, exact)` with `a < b`.
    *
    * Scale shape: singleton buckets are dropped by a count pre-pass before
    * any join, so the self-join only sees buckets that can produce pairs;
    * everything shuffled is (dhash, id, md5) — payload bytes never move.
    * A pathological corpus (billions of copies of ONE image) concentrates
    * in one bucket like any dedup key would; the md5 inside the bucket
    * keys a second-level exact grouping if that ever needs splitting.
    */
  def imageDupCandidates(hashed: DataFrame): DataFrame = {
    val slim = hashed.filter(col("dhash").isNotNull)
      .select(col("dhash"), col("media_id"), col("payload_md5"))
    val dupBuckets = slim.groupBy(col("dhash"))
      .agg(count(lit(1)).as("_n")).filter(col("_n") > 1).select(col("dhash"))
    val members = slim.join(dupBuckets, "dhash")
    members.as("a").join(members.as("b"),
        col("a.dhash") === col("b.dhash") && col("a.media_id") < col("b.media_id"))
      .select(
        col("a.media_id").as("a"), col("b.media_id").as("b"),
        (col("a.payload_md5") === col("b.payload_md5")).as("exact"))
  }

  private def decodeImage(payload: Array[Byte]): Option[BufferedImage] =
    if (payload == null || payload.isEmpty) None
    else
      try Option(ImageIO.read(new ByteArrayInputStream(payload)))
      catch { case _: java.io.IOException => None }

  /** L1-normalized luminance histogram over the decoded pixels — the
    * deterministic stand-in for "embed the image" (a real deployment swaps
    * this one function for its vision encoder; everything around it stays).
    */
  private def luminanceHistogram(img: BufferedImage): Array[Float] = {
    val bins = new Array[Float](FeatureBins)
    val (w, h) = (img.getWidth, img.getHeight)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
        bins(lum * FeatureBins / 256) += 1f
        x += 1
      }
      y += 1
    }
    val total = (w * h).toFloat
    var b = 0
    while (b < FeatureBins) { bins(b) /= total; b += 1 }
    bins
  }

  /** Fallback featurizer for non-image payloads: deterministic byte
    * histogram, L1-normalized.
    */
  private def byteHistogram(payload: Array[Byte]): Array[Float] = {
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

  /** Batch resize: images whose longest side exceeds `maxDim` PIXELS are
    * scaled down (area-averaging, then re-encoded as PNG) and their meta
    * rewritten to the new dimensions. Non-image payloads are untouched
    * unless an explicit `maxBytes` BYTE budget is given, in which case they
    * are nearest-neighbor byte-downsampled — a separate parameter so the
    * pixel and byte semantics can't be conflated on mixed-media input.
    * Same batch shape as decode: one `mapPartitions` pass, no shuffle,
    * schema preserved.
    */
  def resize(media: DataFrame, maxDim: Int, maxBytes: Int = -1): DataFrame = {
    require(maxDim > 0)
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("source", StringType, nullable = true),
      StructField("payload", BinaryType, nullable = true),
      StructField("meta", mediaMetaType, nullable = true)))
    val enc = Encoders.row(schema)
    media.select(col("media_id"), col("source"), col("payload"), col("meta"))
      .mapPartitions { rows =>
        // positional access — same ordering contract as extractFeatures
        rows.map { r =>
          val payload = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          val meta = if (r.isNullAt(3)) null else r.getStruct(3)
          val mime = if (meta == null || meta.isNullAt(0)) "" else meta.getString(0)
          val imgOpt = if (mime.startsWith("image/")) decodeImage(payload) else None
          val (newPayload, newMeta): (Array[Byte], Row) = imgOpt match {
            case Some(img) if math.max(img.getWidth, img.getHeight) > maxDim =>
              val scale = maxDim.toDouble / math.max(img.getWidth, img.getHeight)
              val nw = math.max(1, math.round(img.getWidth * scale).toInt)
              val nh = math.max(1, math.round(img.getHeight * scale).toInt)
              val scaled = new BufferedImage(nw, nh, BufferedImage.TYPE_INT_RGB)
              val g = scaled.createGraphics()
              g.drawImage(
                img.getScaledInstance(nw, nh, java.awt.Image.SCALE_AREA_AVERAGING), 0, 0, null)
              g.dispose()
              val out = new ByteArrayOutputStream(nw * nh)
              ImageIO.write(scaled, "png", out)
              val bytes = out.toByteArray
              // the payload was re-encoded as PNG regardless of input MIME
              (bytes, Row("image/png", nw, nh, bytes.length.toLong))
            case Some(img) =>
              (payload, Row(mime, img.getWidth, img.getHeight, payload.length.toLong))
            case None =>
              val resized =
                if (maxBytes <= 0 || payload == null || payload.length <= maxBytes) payload
                else Array.tabulate(maxBytes)(i =>
                  payload((i.toLong * payload.length / maxBytes).toInt))
              val m =
                if (meta == null || resized == null) meta
                else Row(meta.get(0), meta.get(1), meta.get(2), resized.length.toLong)
              (resized, m)
          }
          Row(r.getLong(0), r.getString(1), newPayload, newMeta)
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

  // ------------------------------------------------------------------ video

  val videoMetaType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("fps", IntegerType, nullable = true),
    StructField("n_bytes", LongType, nullable = true)))

  /** Render a deterministic video container: magic "GVID", big-endian
    * frame count, then length-prefixed REAL PNG frames (the [[renderPng]]
    * codec; frame f renders the content bytes rotated by f, so frames
    * differ deterministically). The container plays the role any MJPEG/
    * fragmented-MP4 file would — an opaque byte string whose frames are
    * individually decodable — while staying reproducible byte-for-byte.
    */
  private[operators] def renderVideo(bytes: Array[Byte], nFrames: Int): Array[Byte] = {
    val frames = (0 until nFrames).map { f =>
      val rot =
        if (bytes.isEmpty) bytes
        else {
          val o = f % bytes.length
          bytes.drop(o) ++ bytes.take(o)
        }
      renderPng(rot)._1
    }
    val bb = java.nio.ByteBuffer.allocate(8 + frames.map(_.length + 4).sum)
    bb.put("GVID".getBytes("US-ASCII")).putInt(nFrames)
    frames.foreach { fr => bb.putInt(fr.length).put(fr) }
    bb.array()
  }

  /** Wrap the corpus as video rows: `3 + id % 5` PNG frames per document
    * rendered from the text bytes — the video counterpart of
    * [[packAsMedia]]/[[packAsAudio]].
    */
  def packAsVideo(docs: DataFrame, fps: Int = 10): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("source", StringType, nullable = true),
      StructField("payload", BinaryType, nullable = true),
      StructField("meta", videoMetaType, nullable = true)))
    val enc = Encoders.row(schema)
    docs.select(col("doc_id").as("media_id"), col("source"), col("text"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val nFrames = 3 + (id % 5).toInt
          val vid = renderVideo(
            r.getString(2).getBytes(java.nio.charset.StandardCharsets.UTF_8), nFrames)
          Row(id, r.getString(1), vid,
            Row("video/x-graft", nFrames, fps, vid.length.toLong))
        }
      }(enc)
  }

  /** Walk a GVID container into its frame payloads; None on anything
    * malformed (never-fail contract, as with [[decodeWav]]).
    */
  private def decodeVideo(payload: Array[Byte]): Option[IndexedSeq[Array[Byte]]] = {
    if (payload == null || payload.length < 8) return None
    if (new String(payload, 0, 4, "US-ASCII") != "GVID") return None
    val bb = java.nio.ByteBuffer.wrap(payload)
    val n = bb.getInt(4)
    if (n < 0) return None
    var at = 8
    val out = IndexedSeq.newBuilder[Array[Byte]]
    var i = 0
    while (i < n) {
      if (at + 4 > payload.length) return None
      val len = bb.getInt(at)
      if (len < 0 || at + 4 + len > payload.length) return None
      out += java.util.Arrays.copyOfRange(payload, at + 4, at + 4 + len)
      at += 4 + len
      i += 1
    }
    Some(out.result())
  }

  /** Sample every `stride`-th frame (0, stride, 2·stride, …) out of video
    * payloads into one IMAGE row per sampled frame — output schema is
    * [[packAsMedia]]'s plus `frame_idx`, so the sampled stream feeds
    * [[extractFeatures]]/[[resize]] unchanged. Container walk and PNG
    * re-wrap run in one `mapPartitions` pass on whichever executor holds
    * the row: frames never cross the wire un-sampled, which is the whole
    * point at 100 TB — a 30 fps corpus subsampled to 1 frame/s ships 3 %
    * of the bytes downstream. Undecodable containers emit zero rows.
    */
  def sampleVideoFrames(media: DataFrame, stride: Int): DataFrame = {
    require(stride > 0, s"stride must be positive, got $stride")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("source", StringType, nullable = true),
      StructField("frame_idx", IntegerType, nullable = false),
      StructField("payload", BinaryType, nullable = true),
      StructField("meta", mediaMetaType, nullable = true)))
    val enc = Encoders.row(outSchema)
    media.select(col("media_id"), col("source"), col("payload"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val payload = if (r.isNullAt(2)) null else r.getAs[Array[Byte]](2)
          decodeVideo(payload).toSeq.flatMap { frames =>
            frames.indices.collect {
              case i if i % stride == 0 =>
                val png = frames(i)
                Row(r.getLong(0), r.getString(1), i, png,
                  Row("image/png", null, null, png.length.toLong))
            }
          }
        }
      }(enc)
  }

  // ------------------------------------------------------------------ audio

  val audioMetaType: StructType = StructType(Seq(
    StructField("mime", StringType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("n_samples", LongType, nullable = true),
    StructField("n_bytes", LongType, nullable = true)))

  /** Render a canonical 44-byte-header mono PCM16LE WAV of a sine tone.
    * Fully deterministic; phase offset 0.123 rad keeps samples away from
    * exact zeros so zero-crossing counts are well-defined.
    */
  private[operators] def renderWav(
      freqHz: Int, sampleRate: Int, nSamples: Int, amplitude: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    bb.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2).putShort(2).putShort(16)
    bb.put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      val v = amplitude * math.sin(2.0 * math.Pi * freqHz * i / sampleRate + 0.123)
      bb.putShort(math.round(v).toShort)
      i += 1
    }
    bb.array()
  }

  /** Wrap the corpus as audio rows: a deterministic tone per document
    * (frequency derives from the id), real RIFF/WAV bytes — the audio
    * counterpart of [[packAsMedia]].
    */
  def packAsAudio(
      docs: DataFrame,
      sampleRate: Int = 8000,
      nSamples: Int = 2000,
      amplitude: Int = 12000): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("source", StringType, nullable = true),
      StructField("payload", BinaryType, nullable = true),
      StructField("meta", audioMetaType, nullable = true)))
    val enc = Encoders.row(schema)
    docs.select(col("doc_id").as("media_id"), col("source"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val freq = 100 + (id % 400).toInt
          val wav = renderWav(freq, sampleRate, nSamples, amplitude)
          Row(id, r.getString(1), wav,
            Row("audio/wav", sampleRate, nSamples.toLong, wav.length.toLong))
        }
      }(enc)
  }

  /** Minimal RIFF/WAV walk: returns (sampleRate, PCM16 samples) for mono
    * 16-bit PCM, None for anything else (the never-fail contract of
    * [[extractFeatures]] applies to audio too).
    */
  private def decodeWav(payload: Array[Byte]): Option[(Int, Array[Short])] = {
    if (payload == null || payload.length < 44) return None
    val bb = java.nio.ByteBuffer.wrap(payload).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag4(at: Int): String = new String(payload, at, 4, "US-ASCII")
    if (tag4(0) != "RIFF" || tag4(8) != "WAVE") return None
    var at = 12
    var sampleRate = -1
    var bits = -1
    var channels = -1
    var data: Array[Short] = null
    while (at + 8 <= payload.length) {
      val tag = tag4(at)
      val len = bb.getInt(at + 4)
      if (len < 0 || at + 8 + len > payload.length) return None
      if (tag == "fmt " && len >= 16) {
        channels = bb.getShort(at + 10).toInt
        sampleRate = bb.getInt(at + 12)
        bits = bb.getShort(at + 22).toInt
      } else if (tag == "data") {
        val n = len / 2
        val out = new Array[Short](n)
        var i = 0
        while (i < n) { out(i) = bb.getShort(at + 8 + i * 2); i += 1 }
        data = out
      }
      at += 8 + len + (len & 1) // chunks are 2-byte aligned
    }
    if (sampleRate > 0 && bits == 16 && channels == 1 && data != null)
      Some((sampleRate, data))
    else None
  }

  /** Audio feature extraction: duration, RMS energy, zero-crossing count —
    * the standard audio-QA triple — per row via one `mapPartitions` pass
    * (decode happens executor-side; nothing but scalars leave the row).
    * Undecodable payloads yield null features, never a failure.
    */
  def extractAudioFeatures(media: DataFrame): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("source", StringType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true),
      StructField("n_samples", LongType, nullable = true),
      StructField("duration_ms", LongType, nullable = true),
      StructField("rms", DoubleType, nullable = true),
      StructField("zero_crossings", LongType, nullable = true)))
    val enc = Encoders.row(outSchema)
    val in = media.select(col("media_id"), col("source"), col("payload"))
    in.mapPartitions { rows =>
      rows.map { r =>
        decodeWav(r.getAs[Array[Byte]](2)) match {
          case Some((sr, samples)) =>
            var sumSq = 0.0
            var zc = 0L
            var i = 0
            var prevSign = 0
            while (i < samples.length) {
              val s = samples(i).toDouble
              sumSq += s * s
              val sign = java.lang.Integer.signum(samples(i).toInt)
              if (sign != 0) {
                if (prevSign != 0 && sign != prevSign) zc += 1
                prevSign = sign
              }
              i += 1
            }
            val n = samples.length
            Row(r.getLong(0), r.getString(1), sr, n.toLong,
              n.toLong * 1000L / sr, if (n == 0) 0.0 else math.sqrt(sumSq / n), zc)
          case None =>
            Row(r.getLong(0), r.getString(1), null, null, null, null, null)
        }
      }
    }(enc)
  }
}
