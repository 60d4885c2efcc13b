package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines. Media payloads are opaque `binary` columns with a typed
  * metadata struct; decode / feature-extraction steps run as per-partition
  * batch transforms over the binary payloads.
  *
  * Image decode is REAL (`decodeImage` via the JDK's built-in
  * `javax.imageio`: PNG/JPEG/GIF/BMP), verified end-to-end by the
  * `q_image_decode` encode→decode round-trip oracle. Audio/video codecs are
  * environment-blocked, so non-image payloads fall back to `decodeStub`'s
  * deterministic fake features; swapping in a real codec changes ONLY that
  * function body — the Spark-side contract (schema, batch iteration,
  * partitioning, spill behavior) is identical and tested.
  *
  * 100 TB posture: media bytes never leave the executor (no collect); the
  * per-partition iterator processes one row at a time (constant memory);
  * `repartitionBySize` right-sizes partitions so a partition of payloads
  * fits executor memory even when individual assets are ~100 MB.
  */
object Multimodal {

  /** Typed metadata carried next to every media payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("format", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType)))

  /** Attach a metadata struct derived from the payload (format sniffing from
    * magic bytes). PNG width/height parse straight out of the IHDR chunk
    * (bytes 17-24, big-endian) with pure column functions — codegen'd header
    * metadata at scan speed, no decode; other formats leave them null until
    * decode.
    */
  def withMediaMeta(df: DataFrame, binCol: String): DataFrame = {
    val b = col(binCol)
    val magic = substring(hex(b), 1, 8)
    val isPng = magic.startsWith("89504E47")
    val format = when(magic.startsWith("FFD8"), "jpeg")
      .when(isPng, "png")
      .when(magic.startsWith("52494646"), "riff-wav")
      .otherwise("unknown")
    def pngBe32(pos: Int) =
      conv(hex(substring(b, pos, 4)), 16, 10).cast(IntegerType)
    df.withColumn(
      "media_meta",
      struct(
        format.as("format"),
        when(isPng, pngBe32(17)).cast(IntegerType).as("width"),
        when(isPng, pngBe32(21)).cast(IntegerType).as("height"),
        length(b).cast(LongType).as("n_bytes")))
  }

  /** A really-decoded image: dimensions, mean pixel luminance (0-255), and a
    * `dim`-cell grid-pooled luminance feature vector in [0,1).
    */
  final case class Decoded(
      width: Int,
      height: Int,
      meanLuma: Double,
      features: Array[Float])

  /** Cheap magic-byte sniff gating the ImageIO attempt — text/audio payloads
    * skip reader discovery entirely. */
  private def looksLikeImage(p: Array[Byte]): Boolean =
    p != null && p.length > 24 && (
      (p(0) == 0x89.toByte && p(1) == 0x50.toByte) ||             // PNG
        (p(0) == 0xFF.toByte && p(1) == 0xD8.toByte) ||           // JPEG
        (p(0) == 'G'.toByte && p(1) == 'I'.toByte && p(2) == 'F'.toByte) ||
        (p(0) == 'B'.toByte && p(1) == 'M'.toByte))               // BMP

  /** REAL decode via the JDK's built-in `javax.imageio` (PNG/JPEG/GIF/BMP —
    * no external codec needed). One streaming pass over the pixels computes
    * the mean luminance and the grid-pooled features; the pixel raster is
    * released with the method frame (constant executor memory per row).
    * Returns None when no ImageIO reader claims the payload — callers fall
    * back to `decodeStub`.
    */
  def decodeImage(payload: Array[Byte], dim: Int = 16): Option[Decoded] = {
    if (!looksLikeImage(payload)) return None
    // corrupt bodies behind a valid magic can throw more than IOException
    // from ImageIO plugins (IndexOutOfBounds, CMMException, ...) — a dirty
    // corpus must degrade to the fallback, never kill the task
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return None
    val w = img.getWidth
    val h = img.getHeight
    val nPix = w.toLong * h
    val sums = new Array[Double](dim)
    val counts = new Array[Long](dim)
    var total = 0.0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val luma =
          (((rgb >> 16) & 0xFF) + ((rgb >> 8) & 0xFF) + (rgb & 0xFF)) / 3.0
        val cell = math.min(dim - 1, ((y.toLong * w + x) * dim / nPix).toInt)
        sums(cell) += luma
        counts(cell) += 1
        total += luma
        x += 1
      }
      y += 1
    }
    val feats = Array.tabulate(dim) { i =>
      if (counts(i) == 0) 0f else (sums(i) / counts(i) / 255.0).toFloat
    }
    Some(Decoded(w, h, total / nPix, feats))
  }

  /** REAL image resize (decode → scale → re-encode PNG): bilinear
    * `Graphics2D` scaling via the JDK, no external codec. Returns None when
    * the payload isn't a decodable image — callers keep the original
    * payload or drop the row. Runs executor-side inside `resizeImages`.
    */
  def resizeImage(
      payload: Array[Byte],
      targetWidth: Int,
      targetHeight: Int): Option[Array[Byte]] = {
    require(targetWidth > 0 && targetHeight > 0, "target dimensions must be positive")
    if (!looksLikeImage(payload)) return None
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
      catch { case scala.util.control.NonFatal(_) => null }
    if (img == null) return None
    val out = new java.awt.image.BufferedImage(
      targetWidth, targetHeight, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try {
      g.setRenderingHint(
        java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g.drawImage(img, 0, 0, targetWidth, targetHeight, null)
    } finally g.dispose()
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(out, "png", bos)
    Some(bos.toByteArray)
  }

  /** Per-partition batch resize over (id, binary) rows → (id, resized PNG
    * payload); undecodable payloads yield null. Same streaming
    * constant-memory contract as `extractFeatures`.
    */
  def resizeImages(
      df: DataFrame,
      idCol: String,
      binCol: String,
      targetWidth: Int,
      targetHeight: Int): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("payload", BinaryType)))
    val projected = df.select(col(idCol).cast(LongType), col(binCol))
    val rdd = projected.rdd.mapPartitions { rows =>
      rows.map { r =>
        Row(
          if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0)),
          resizeImage(r.getAs[Array[Byte]](1), targetWidth, targetHeight).orNull)
      }
    }
    spark.createDataFrame(rdd, schema)
      .withColumnRenamed("id", idCol)
      .withColumnRenamed("payload", binCol)
  }

  /** Encode a uniform-gray PNG via `javax.imageio` — the deterministic
    * synthetic payload behind the decode round-trip oracle (`q_image_decode`)
    * and media-pipeline tests.
    */
  def encodeGrayPng(width: Int, height: Int, gray: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
    val rgb = (gray << 16) | (gray << 8) | gray
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { img.setRGB(x, y, rgb); x += 1 }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** STUB decode for payloads ImageIO can't read (non-image formats — real
    * audio/video codecs are environment-blocked): deterministic
    * pseudo-features from the payload bytes. Features are hashes of byte
    * slices, normalized to [0,1).
    */
  def decodeStub(payload0: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real audio/video decoder goes here; image payloads take the
    // real `decodeImage` path, and this deterministic fake keeps the
    // plumbing testable end-to-end for the rest. NULL payloads decode as
    // empty (a missing asset must not kill the task).
    val payload = if (payload0 == null) Array.emptyByteArray else payload0
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      var h = 1125899906842597L + i
      var j = i
      while (j < payload.length) { h = 31 * h + payload(j); j += dim }
      out(i) = math.abs(h % 1000003L).toFloat / 1000003f
      i += 1
    }
    out
  }

  /** Per-partition batch transform over (id, binary) rows → (id, features).
    * The Scala analogue of a Pandas `mapInPandas` UDF: one iterator pass per
    * partition, constant memory, executor-side only.
    */
  def extractFeatures(
      df: DataFrame,
      idCol: String,
      binCol: String,
      dim: Int = 16): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("features", ArrayType(FloatType))))
    val projected = df.select(col(idCol).cast(LongType), col(binCol))
    val rdd = projected.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
        val payload = r.getAs[Array[Byte]](1)
        val feats = decodeImage(payload, dim)
          .map(_.features)
          .getOrElse(decodeStub(payload, dim))
        Row(id, feats.toSeq)
      }
    }
    spark.createDataFrame(rdd, schema).withColumnRenamed("id", idCol)
  }

  /** Full decode round-trip over (id, binary) rows: really decode each image
    * payload (ImageIO) and emit its dimensions and integral mean luminance;
    * undecodable payloads yield nulls. Same per-partition streaming contract
    * as `extractFeatures`.
    */
  def decodeImages(df: DataFrame, idCol: String, binCol: String): DataFrame = {
    val spark = df.sparkSession
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("mean_luma", DoubleType)))
    val projected = df.select(col(idCol).cast(LongType), col(binCol))
    val rdd = projected.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = if (r.isNullAt(0)) null else java.lang.Long.valueOf(r.getLong(0))
        decodeImage(r.getAs[Array[Byte]](1), dim = 1) match {
          case Some(d) => Row(id, d.width, d.height, d.meanLuma)
          case None    => Row(id, null, null, null)
        }
      }
    }
    spark.createDataFrame(rdd, schema).withColumnRenamed("id", idCol)
  }

  /** Frame-sampling plumbing: every `stride`-th chunk of `chunkBytes` from
    * the payload, as REAL binary slices (stands in for video frame
    * extraction — a real pipeline replaces the fixed-size chunking with
    * container-aware frame offsets; the select-every-Nth shape and the
    * array<binary> output contract are identical). Pure column functions —
    * stays in codegen; output size is payload/stride, never a copy blowup.
    */
  def sampleChunks(binCol: Column, chunkBytes: Int, stride: Int): Column = {
    val nChunks =
      greatest(ceil(length(binCol).cast(DoubleType) / chunkBytes), lit(1)).cast(IntegerType)
    transform(
      filter(sequence(lit(0), nChunks - 1), i => i % stride === 0),
      i => binCol.substr(i * chunkBytes + 1, lit(chunkBytes)))
  }

  /** Right-size partitions for heavy binary payloads: aim for
    * `targetPartitionBytes` per partition using the known average asset size.
    */
  def repartitionBySize(
      df: DataFrame,
      avgAssetBytes: Long,
      totalAssets: Long,
      targetPartitionBytes: Long = 256L << 20): DataFrame = {
    val perPartition = math.max(1L, targetPartitionBytes / math.max(1L, avgAssetBytes))
    val parts        = math.max(1, math.ceil(totalAssets.toDouble / perPartition).toInt)
    df.repartition(parts)
  }
}
