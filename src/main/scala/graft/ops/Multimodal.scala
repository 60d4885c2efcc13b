package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines. Media payloads are opaque `binary` columns with a typed
  * metadata struct; decode / feature-extraction steps run as per-partition
  * batch transforms over the binary payloads.
  *
  * The actual codec calls are STUBBED (this environment has no image/audio
  * libraries): `decodeStub` derives a deterministic fake feature vector from
  * the bytes. Swapping in a real decoder changes ONLY the function body
  * passed to `mapBinaryBatches` — the Spark-side contract (schema, batch
  * iteration, partitioning, spill behavior) is real and tested.
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
    * magic bytes; width/height unknown until decode → null).
    */
  def withMediaMeta(df: DataFrame, binCol: String): DataFrame = {
    val b = col(binCol)
    val magic = substring(hex(b), 1, 8)
    val format = when(magic.startsWith("FFD8"), "jpeg")
      .when(magic.startsWith("89504E47"), "png")
      .when(magic.startsWith("52494646"), "riff-wav")
      .otherwise("unknown")
    df.withColumn(
      "media_meta",
      struct(
        format.as("format"),
        lit(null).cast(IntegerType).as("width"),
        lit(null).cast(IntegerType).as("height"),
        length(b).cast(LongType).as("n_bytes")))
  }

  /** STUB decode: deterministic pseudo-features from the payload bytes.
    * Stands in for `imageDecode → resize → embed`; replace the body with a
    * real codec (e.g. via a JNI/Java image library) without touching any
    * caller. Features are hashes of byte slices, normalized to [0,1).
    */
  def decodeStub(payload: Array[Byte], dim: Int): Array[Float] = {
    // ??? <- real decoder goes here; deterministic fake below keeps the
    // plumbing testable end-to-end.
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
        val id      = r.getLong(0)
        val payload = r.getAs[Array[Byte]](1)
        Row(id, decodeStub(payload, dim).toSeq)
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
