package graft.textops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, batch-shaped decode/feature-extract over partitions.
  *
  * The Spark-side contract is real — schema, partitioning, batch iteration
  * — while the actual media decode is STUBBED (no image/audio libraries in
  * this container): [[decodeStub]] produces deterministic fake features
  * from the bytes. Swapping in a real decoder means replacing only that
  * function; everything around it (mapPartitions batching, feature schema,
  * writer) is production-shaped. This mirrors a `mapInPandas` pipeline:
  * one iterator of batches per partition, vectorized work inside.
  */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("blob", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("n_bytes", LongType),
      StructField("source", StringType))))))

  /** Wrap a text corpus as a media table: UTF-8 bytes as the opaque blob
    * (stand-in for image/audio payloads) plus typed metadata. */
  def asMediaTable(docs: DataFrame, idCol: String, textCol: String,
                   sourceCol: String): DataFrame =
    docs.select(
      col(idCol).cast(LongType).as("media_id"),
      encode(col(textCol), "UTF-8").as("blob"),
      struct(
        lit("application/octet-stream").as("mime"),
        octet_length(encode(col(textCol), "UTF-8")).cast(LongType).as("n_bytes"),
        col(sourceCol).as("source")).as("meta"))

  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", LongType),
    StructField("fake_width", IntegerType),
    StructField("fake_height", IntegerType),
    StructField("byte_mean", DoubleType),
    StructField("content_sha", StringType)))

  /** STUB decoder — deterministic fake in place of a real image/audio
    * decode (`???` boundary). A real implementation would parse the codec
    * here; the fake dimensions/statistics are derived only from byte
    * aggregates (length, unsigned byte sum) so they are reproducible
    * AND re-computable outside the JVM — the DuckDB oracle rebuilds
    * them from hex(blob), proving the mapPartitions plumbing end to
    * end even though the decode itself is environment-blocked. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Double) = {
    val n = bytes.length
    var s = 0L
    var i = 0
    while (i < n) { s += (bytes(i) & 0xFF); i += 1 }
    // byte sums of integers stay exactly representable in a double, so
    // mean is bit-identical to an integer-sum-then-divide in any engine
    val mean = if (n == 0) 0.0 else s.toDouble / n
    (((s % 1920) + 1).toInt, ((s / 1920) % 1080 + 1).toInt, mean)
  }

  /** Feature extraction over media batches: per-partition iteration (the
    * `mapInPandas` shape — decode amortized across a batch, constant
    * memory per task). Runs on executors; no driver collection. */
  def extractFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rows = media.select("media_id", "blob").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h, mean) = decodeStub(bytes)
        val sha = java.security.MessageDigest.getInstance("SHA-256")
          .digest(bytes).map("%02x".format(_)).mkString
        Row(id, bytes.length.toLong, w, h, mean, sha)
      }
    }
    spark.createDataFrame(rows, featureSchema)
  }

  /** Pure-expression subset of the features (no decode needed) — stays in
    * codegen and is what the DuckDB oracle checks. */
  def blobStats(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("meta.n_bytes").as("n_bytes"),
      sha2(col("blob"), 256).as("content_sha"),
      col("meta.source").as("source"))

  val frameSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame_bytes", IntegerType),
    StructField("frame_mean", DoubleType)))

  /** Frame sampling over "video" blobs: the blob is treated as a
    * sequence of fixed-size frames and every `stride`-th frame is
    * emitted — a 1→N expansion done per-partition with constant memory
    * (one frame in flight), the exact batch shape a real codec's
    * keyframe sampler would use behind `mapInPandas`. Frame decode is
    * the STUB boundary: stats are computed from the raw bytes. */
  def sampleFrames(media: DataFrame, frameSize: Int = 256,
                   stride: Int = 4): DataFrame = {
    require(frameSize > 0 && stride > 0, "frameSize and stride must be positive")
    val spark = media.sparkSession
    val rows = media.select("media_id", "blob").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val nFrames = (bytes.length + frameSize - 1) / frameSize
        (0 until nFrames by stride).iterator.map { f =>
          val from = f * frameSize
          val until = math.min(from + frameSize, bytes.length)
          var sum = 0.0
          var i = from
          while (i < until) { sum += (bytes(i) & 0xFF); i += 1 }
          Row(id, f, until - from, sum / (until - from))
        }
      }
    }
    spark.createDataFrame(rows, frameSchema)
  }

  /** Resize-stub: maps each media's fake decoded dimensions to a target
    * box preserving aspect ratio (integer floor), the metadata half of a
    * real resize; the pixel work is the stubbed `???` boundary. Pure
    * per-row arithmetic — stays a single mapPartitions batch pass. */
  def resizeMeta(features: DataFrame, maxW: Int = 224, maxH: Int = 224): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / col("fake_width"),
      lit(maxH.toDouble) / col("fake_height"),
      lit(1.0))
    features.select(
      col("media_id"),
      col("fake_width"), col("fake_height"),
      floor(col("fake_width") * scale).cast(IntegerType).as("out_width"),
      floor(col("fake_height") * scale).cast(IntegerType).as("out_height"))
  }
}
