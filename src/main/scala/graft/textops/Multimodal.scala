package graft.textops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: media as opaque `binary` columns with typed
  * metadata, batch-shaped decode/feature-extract over partitions.
  *
  * The IMAGE path is fully real: [[generatePng]] encodes deterministic
  * gradient images through the JDK's `javax.imageio` PNG writer and
  * [[decodeImage]] parses the compressed bytes back with `ImageIO.read`,
  * so [[extractImageFeatures]] measures genuine decoded pixels (width,
  * height, per-channel means). Because the generator's pixel pattern has
  * closed-form channel statistics, the DuckDB oracle verifies the decode
  * analytically from the media id — a real codec round-trip, hash-proven.
  *
  * The MULTI-FRAME path is real too: [[generateGif]] encodes animated
  * GIF through `javax.imageio`'s sequence writer and
  * [[extractFrameFeatures]] parses the container back frame by frame
  * (`getNumImages`/`read(i)`), measuring genuine per-frame pixels.
  * Only [[sampleFrames]] keeps the raw byte-chunk interpretation — as
  * the codec-agnostic fallback for formats no JVM codec can open (e.g.
  * H.264), with the same per-partition 1→N batch shape.
  */
object Multimodal {

  // javax.imageio defaults to a disk-backed stream cache (a temp file per
  // encode/decode); executor-thread hot loops want the in-memory cache.
  javax.imageio.ImageIO.setUseCache(false)

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

  // ---- real image path (javax.imageio PNG round-trip) -------------------

  /** Deterministic synthetic image for a media id: dimensions and pixel
    * pattern are pure functions of the id, and every channel's mean has a
    * closed form, so an engine that cannot decode PNG (the DuckDB oracle)
    * can still verify the decoded features analytically:
    *
    *   width  w = 16 + (id mod 49)          ∈ [16, 64]
    *   height h = 16 + ((id * 31) mod 49)   ∈ [16, 64]
    *   R(x,y) = x   → mean_r = (w-1)/2      (each column weighted equally)
    *   G(x,y) = y   → mean_g = (h-1)/2
    *   B(x,y) = id mod 256                  → mean_b = id mod 256
    *
    * The gradient makes every pixel distinct (a constant-color fake would
    * not prove a pixel loop), PNG is lossless RGB so the round-trip is
    * exact, and all three means are exactly representable doubles. */
  def generatePng(id: Long): Array[Byte] = {
    val w = 16 + java.lang.Math.floorMod(id, 49L).toInt
    val h = 16 + java.lang.Math.floorMod(id * 31L, 49L).toInt
    val b = java.lang.Math.floorMod(id, 256L).toInt
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { img.setRGB(x, y, (x << 16) | (y << 8) | b); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Media table of real PNG blobs, one per id — generated executor-side
    * in a per-partition batch loop (never on the driver). */
  def imageMediaTable(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    val rows = ids.select(col(idCol).cast(LongType)).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val png = generatePng(id)
        Row(id, png, Row("image/png", png.length.toLong, "synthetic"))
      }
    }
    spark.createDataFrame(rows, mediaSchema)
  }

  val imageFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_pixels", LongType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType)))

  /** Real PNG/JPEG decode: `ImageIO.read` parses the compressed bytes and
    * the pixel loop computes per-channel means. Integer channel sums stay
    * exactly representable in doubles (≤255·w·h), so sum-then-divide is
    * bit-reproducible across engines. */
  def decodeImage(bytes: Array[Byte]): (Int, Int, Double, Double, Double) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    require(img != null, "undecodable image blob")
    val w = img.getWidth
    val h = img.getHeight
    var (sr, sg, sb) = (0L, 0L, 0L)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    (w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
  }

  /** Feature extraction over media batches: per-partition iteration (the
    * `mapInPandas` shape — decoder state amortized across a batch,
    * constant memory per task). Runs on executors; no driver collection.
    * The decode is REAL — `javax.imageio` parses each PNG blob. */
  def extractImageFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rows = media.select("media_id", "blob").rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val (w, h, mr, mg, mb) = decodeImage(bytes)
        Row(id, w, h, w.toLong * h, mr, mg, mb)
      }
    }
    spark.createDataFrame(rows, imageFeatureSchema)
  }

  /** Pure-expression subset of the features (no decode needed) — stays in
    * codegen and is what the DuckDB oracle checks. */
  def blobStats(media: DataFrame): DataFrame =
    media.select(
      col("media_id"),
      col("meta.n_bytes").as("n_bytes"),
      sha2(col("blob"), 256).as("content_sha"),
      col("meta.source").as("source"))

  val histSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("bin", IntegerType),
    StructField("n_pix", LongType)))

  /** 16-bin R-channel histogram from the REAL decoded pixels (bin =
    * r >> 2 over the generator's r ∈ [0, 63] range): the standard
    * image-statistics op a curation pipeline runs for exposure/clipping
    * checks, and a stronger decode proof than a channel mean — a mean
    * survives many pixel-loop bugs that a histogram's exact per-bin
    * counts do not. Per-partition batch loop, constant memory (one
    * 16-slot array in flight); empty bins are not emitted. The
    * generator's R(x,y) = x makes every bin's count closed-form
    * (h · |[4b, 4b+4) ∩ [0, w)|), which is what the DuckDB oracle
    * checks without decoding anything. */
  def channelHistogram(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rows = media.select("media_id", "blob").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
        require(img != null, "undecodable image blob")
        // r>>2 ranges over 0..63 for arbitrary 8-bit images; the array is
        // sized for the full range so a generator/width change can never
        // index out of bounds, while empty bins are still never emitted
        // (the synthetic gradient only populates bins 0..15)
        val counts = new Array[Long](64)
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            counts(((img.getRGB(x, y) >> 16) & 0xFF) >> 2) += 1L
            x += 1
          }
          y += 1
        }
        counts.indices.iterator.filter(counts(_) > 0L)
          .map(b => Row(id, b, counts(b)))
      }
    }
    spark.createDataFrame(rows, histSchema)
  }

  // ---- real multi-frame path (javax.imageio animated GIF) ---------------

  /** Deterministic multi-frame animated GIF for a media id — the real-
    * codec twin of [[sampleFrames]]'s byte-stub: `javax.imageio` both
    * encodes (writeToSequence) and decodes (getNumImages/read(i))
    * multi-frame GIF natively, so frame EXTRACTION runs a genuine
    * container parse + per-frame decode. Geometry and pixels are pure
    * functions of the id:
    *
    *   frames nf = 2 + (id mod 4)        ∈ [2, 5]
    *   width  w  = 8 + (id mod 9)        ∈ [8, 16]
    *   height h  = 8 + ((id·7) mod 9)    ∈ [8, 16]
    *   pixel(x, y) of frame f = palette index (x + f) mod 16
    *   palette i = (16i, 8i, 4i)
    *
    * The image is TYPE_BYTE_INDEXED over an EXPLICIT 16-entry palette,
    * so GIF's palette stage is lossless (no quantizer choices) and each
    * frame's channel means have closed forms in the id — which is what
    * lets the codec-less DuckDB oracle verify a real container parse.
    * The f shift makes every frame's mean distinct, so a frame-index
    * bug (off-by-one, compositing, disposal) breaks the hash. */
  def generateGif(id: Long): Array[Byte] = {
    val nf = 2 + java.lang.Math.floorMod(id, 4L).toInt
    val w = 8 + java.lang.Math.floorMod(id, 9L).toInt
    val h = 8 + java.lang.Math.floorMod(id * 7L, 9L).toInt
    val icm = new java.awt.image.IndexColorModel(4, 16,
      Array.tabulate(16)(i => (i * 16).toByte),
      Array.tabulate(16)(i => (i * 8).toByte),
      Array.tabulate(16)(i => (i * 4).toByte))
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("gif").next()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(out)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    var f = 0
    while (f < nf) {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, icm)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, (x + f) % 16); x += 1 }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
      f += 1
    }
    writer.endWriteSequence()
    writer.dispose()
    ios.close()
    out.toByteArray
  }

  /** Media table of real animated-GIF blobs, one per id — generated
    * executor-side per partition, like [[imageMediaTable]]. */
  def gifMediaTable(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    val rows = ids.select(col(idCol).cast(LongType)).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val gif = generateGif(id)
        Row(id, gif, Row("image/gif", gif.length.toLong, "synthetic"))
      }
    }
    spark.createDataFrame(rows, mediaSchema)
  }

  val frameFeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType)))

  /** REAL per-frame feature extraction: the GIF container is parsed
    * with an ImageIO reader (`getNumImages(true)` walks the frame
    * sequence), every frame decodes through the palette, and the pixel
    * loop measures per-channel means — integer sums stay exactly
    * representable, so sum-then-divide is bit-reproducible. 1→N
    * expansion per blob with one frame in flight: the keyframe-sampler
    * batch shape, now with a genuine codec behind it. */
  def extractFrameFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val rows = media.select("media_id", "blob").rdd.mapPartitions { it =>
      it.flatMap { r =>
        val id = r.getLong(0)
        val reader = javax.imageio.ImageIO
          .getImageReadersByFormatName("gif").next()
        reader.setInput(new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1))))
        val n = reader.getNumImages(true)
        val frames = (0 until n).map { f =>
          val img = reader.read(f)
          val w = img.getWidth
          val h = img.getHeight
          var (sr, sg, sb) = (0L, 0L, 0L)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xFF; sg += (rgb >> 8) & 0xFF; sb += rgb & 0xFF
              x += 1
            }
            y += 1
          }
          val np = w.toLong * h
          Row(id, f, w, h, sr.toDouble / np, sg.toDouble / np, sb.toDouble / np)
        }
        reader.dispose()
        frames
      }
    }
    spark.createDataFrame(rows, frameFeatureSchema)
  }

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

  /** Resize planning: maps each media's REAL decoded dimensions (from
    * [[extractImageFeatures]]) to a target box preserving aspect ratio
    * (integer floor) — the geometry half of a resize, as pure column
    * arithmetic that stays in whole-stage codegen. IEEE double ops are
    * deterministic, so the oracle replays the same formula exactly. */
  def resizeMeta(features: DataFrame, maxW: Int = 224, maxH: Int = 224): DataFrame = {
    val scale = least(
      lit(maxW.toDouble) / col("width"),
      lit(maxH.toDouble) / col("height"),
      lit(1.0))
    features.select(
      col("media_id"),
      col("width"), col("height"),
      floor(col("width") * scale).cast(IntegerType).as("out_width"),
      floor(col("height") * scale).cast(IntegerType).as("out_height"))
  }

  // ---- container METADATA without codecs (WAV/RIFF + MP4 box walks) ----
  //
  // The H.264/AAC PAYLOAD needs codecs the JVM doesn't ship — but the
  // CONTAINER layout is a public byte format (RIFF chunks; ISO-BMFF
  // boxes), and duration / resolution / sample rate / track count live
  // entirely in it. These operators parse generated-but-well-formed
  // blobs with PURE COLUMN EXPRESSIONS (one hex projection + bounded
  // chunk/box walks via `aggregate` over a step sequence) — fully
  // codegen, no UDF, no mapPartitions: the 100 TB shape for "scan a
  // billion media files and index their metadata".

  private def strHex(s: String): String =
    s.getBytes("ISO-8859-1").map(b => f"${b & 0xFF}%02X").mkString

  /** Minimal well-formed WAV from id-derived parameters (k = id div 2,
    * since [[containerMediaTable]] routes even ids here — parameters on
    * raw id mod would never vary). Layout VARIES: every third k carries
    * a LIST/INFO chunk between the RIFF header and fmt — a fixed-offset
    * reader mis-parses those, so the chunk walk must be real. Closed
    * forms for the oracle:
    *   sample_rate = [8000,16000,22050,44100][k mod 4]
    *   channels    = 1 + (k mod 2)
    *   n_samples   = 500 + (k mod 7) * 137      (16-bit PCM)
    */
  def generateWav(id: Long): Array[Byte] = {
    val k = java.lang.Math.floorDiv(id, 2L)
    val rate = Array(8000, 16000, 22050, 44100)(
      java.lang.Math.floorMod(k, 4L).toInt)
    val channels = 1 + java.lang.Math.floorMod(k, 2L).toInt
    val nSamples = 500 + java.lang.Math.floorMod(k, 7L).toInt * 137
    val dataLen = nSamples * channels * 2
    val withList = java.lang.Math.floorMod(k, 3L) == 0L
    val listLen = if (withList) 8 + 12 else 0
    val bb = java.nio.ByteBuffer
      .allocate(12 + listLen + 24 + 8 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def tag(s: String): Unit = bb.put(s.getBytes("ISO-8859-1"))
    tag("RIFF"); bb.putInt(4 + listLen + 24 + 8 + dataLen); tag("WAVE")
    if (withList) { tag("LIST"); bb.putInt(12); tag("INFO")
      tag("ISFT"); bb.putInt(0) }
    tag("fmt "); bb.putInt(16)
    bb.putShort(1.toShort)                    // PCM
    bb.putShort(channels.toShort)
    bb.putInt(rate)
    bb.putInt(rate * channels * 2)            // byte rate
    bb.putShort((channels * 2).toShort)       // block align
    bb.putShort(16.toShort)                   // bits per sample
    tag("data"); bb.putInt(dataLen)
    // silent PCM payload: the metadata lives in the size field
    bb.array()
  }

  /** Minimal well-formed MP4 (ISO-BMFF): ftyp [free] moov(mvhd trak(tkhd)×k) mdat.
    * Layout varies (every second k = id div 2 carries a `free` box
    * before moov). Closed forms for the oracle:
    *   timescale = [600,1000,90000][k mod 3]
    *   duration  = timescale * (1 + k mod 5) + (k mod 97)   (ticks)
    *   n_tracks  = 1 + (k mod 3)
    *   width     = 320 + 16 * (k mod 8); height = 240 + 16 * (k mod 6)
    */
  def generateMp4(id: Long): Array[Byte] = {
    val k = java.lang.Math.floorDiv(id, 2L)
    val timescale = Array(600, 1000, 90000)(
      java.lang.Math.floorMod(k, 3L).toInt)
    val durTicks = timescale.toLong * (1 + java.lang.Math.floorMod(k, 5L)) +
      java.lang.Math.floorMod(k, 97L)
    val nTraks = 1 + java.lang.Math.floorMod(k, 3L).toInt
    val width = 320 + 16 * java.lang.Math.floorMod(k, 8L).toInt
    val height = 240 + 16 * java.lang.Math.floorMod(k, 6L).toInt
    val withFree = java.lang.Math.floorMod(k, 2L) == 0L
    val freeLen = if (withFree) 16 else 0
    val trakLen = 8 + 92                       // trak(tkhd)
    val moovLen = 8 + 108 + nTraks * trakLen   // moov(mvhd traks)
    val bb = java.nio.ByteBuffer
      .allocate(16 + freeLen + moovLen + 8)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    def tag(s: String): Unit = bb.put(s.getBytes("ISO-8859-1"))
    bb.putInt(16); tag("ftyp"); tag("isom"); bb.putInt(0)
    if (withFree) { bb.putInt(16); tag("free"); bb.putLong(0L) }
    bb.putInt(moovLen); tag("moov")
    bb.putInt(108); tag("mvhd")
    bb.putInt(0)                               // version 0 + flags
    bb.putInt(0); bb.putInt(0)                 // ctime, mtime
    bb.putInt(timescale)
    bb.putInt(durTicks.toInt)
    bb.putInt(0x00010000); bb.putShort(0x0100.toShort); bb.putShort(0)
    (0 until 2).foreach(_ => bb.putInt(0))     // reserved
    val matrix = Array(0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)
    matrix.foreach(bb.putInt)
    (0 until 6).foreach(_ => bb.putInt(0))     // pre_defined
    bb.putInt(nTraks + 1)                      // next_track_ID
    (1 to nTraks).foreach { tid =>
      bb.putInt(trakLen); tag("trak")
      bb.putInt(92); tag("tkhd")
      bb.putInt(7)                             // version 0, flags=enabled
      bb.putInt(0); bb.putInt(0)               // ctime, mtime
      bb.putInt(tid); bb.putInt(0)             // track_ID, reserved
      bb.putInt(durTicks.toInt)
      bb.putLong(0L)                           // reserved
      bb.putShort(0); bb.putShort(0); bb.putShort(0); bb.putShort(0)
      matrix.foreach(bb.putInt)
      bb.putInt(width << 16); bb.putInt(height << 16) // 16.16 fixed
    }
    bb.putInt(8); tag("mdat")                  // empty payload
    bb.array()
  }

  /** Media table of container blobs: even ids are WAV, odd ids MP4 —
    * generated executor-side like [[imageMediaTable]]. */
  def containerMediaTable(ids: DataFrame, idCol: String): DataFrame = {
    val spark = ids.sparkSession
    val rows = ids.select(col(idCol).cast(LongType)).rdd.mapPartitions { it =>
      it.map { r =>
        val id = r.getLong(0)
        val wav = java.lang.Math.floorMod(id, 2L) == 0L
        val blob = if (wav) generateWav(id) else generateMp4(id)
        Row(id, blob,
          Row(if (wav) "audio/wav" else "video/mp4",
            blob.length.toLong, "synthetic"))
      }
    }
    spark.createDataFrame(rows, mediaSchema)
  }

  // expression-level byte readers over the hex projection (pos is a
  // 0-based BYTE offset Column; hex() is 2 chars per byte, 1-based)
  private def bytesAt(hx: Column, pos: Column, n: Int): Column =
    hx.substr((pos * 2 + 1).cast(IntegerType), lit(2 * n))
  private def u32be(hx: Column, pos: Column): Column =
    conv(bytesAt(hx, pos, 4), 16, 10).cast(LongType)
  private def u64be(hx: Column, pos: Column): Column =
    conv(bytesAt(hx, pos, 8), 16, 10).cast(LongType)
  private def u32le(hx: Column, pos: Column): Column =
    conv(concat(bytesAt(hx, pos + 3, 1), bytesAt(hx, pos + 2, 1),
      bytesAt(hx, pos + 1, 1), bytesAt(hx, pos, 1)), 16, 10).cast(LongType)
  private def u16le(hx: Column, pos: Column): Column =
    conv(concat(bytesAt(hx, pos + 1, 1), bytesAt(hx, pos, 1)), 16, 10)
      .cast(LongType)

  /** Bounded RIFF chunk walk: position of the first chunk whose 4-byte
    * type matches, starting at byte 12, or -1. Chunks advance by
    * 8 + size + pad-to-even (RIFF sizes exclude the 8-byte header). */
  private def riffChunkPos(hx: Column, typ: String, maxSteps: Int = 8): Column =
    aggregate(sequence(lit(1), lit(maxSteps)),
      struct(lit(12L).as("off"), lit(-1L).as("pos")),
      (st, _) => {
        val off = st.getField("off")
        val pos = st.getField("pos")
        // 16 hex chars = the full 8-byte chunk header: a blob truncated
        // mid-header terminates the walk instead of conv-ing a short
        // substring into null/garbage sizes (r9 ADVICE)
        val done = pos >= 0 || off * 2 + 16 > length(hx)
        val tp = bytesAt(hx, off, 4)
        val sz = u32le(hx, off + 4)
        struct(
          when(done, off)
            .otherwise(off + 8 + sz + pmod(sz, lit(2L))).as("off"),
          when(pos >= 0, pos)
            .when(!done && tp === lit(strHex(typ)), off)
            .otherwise(lit(-1L)).as("pos"))
      }).getField("pos")

  /** Bounded ISO-BMFF box walk within [start, end): position of the
    * first box of `typ` (or -1), and the count of boxes of `typ`.
    * Boxes advance by their effective size: the 32-bit BE size (which
    * includes the header) in the common case, `end − off` for size 0
    * (box extends to the end of the enclosing range, necessarily the
    * last box), and the 64-bit largesize following the type for size 1
    * — per ISO BMFF, both are valid and the r10 walk over-rejected them,
    * silently losing every subsequent box (r10 ADVICE). Sizes in [2,8)
    * (or a null from a truncated read, or a largesize below its own
    * 16-byte header) remain malformed and terminate the walk cleanly
    * instead of stalling in place (r9 ADVICE). */
  private def mp4BoxScan(hx: Column, start: Column, end0: Column,
                         typ: String, maxSteps: Int = 8): Column = {
    // callers pass length(hx)/2 (a DOUBLE division) as the range end;
    // normalize to long so the fold's struct keeps its LongType fields
    val end = end0.cast(LongType)
    aggregate(sequence(lit(1), lit(maxSteps)),
      struct(start.cast(LongType).as("off"), lit(-1L).as("pos"),
        lit(0L).as("cnt")),
      (st, _) => {
        val off = st.getField("off")
        val pos = st.getField("pos")
        val cnt = st.getField("cnt")
        val tp = bytesAt(hx, off + 4, 4)
        val sz32 = u32be(hx, off)
        val lsz = u64be(hx, off + 8)
        val sz = when(sz32 === 0, end - off)
          .when(sz32 === 1, lsz).otherwise(sz32)
        val done = off + 8 > end || sz32.isNull ||
          (sz32 === 1 && (off + 16 > end || lsz.isNull || lsz < 16)) ||
          (sz32 >= 2 && sz32 < 8)
        val hit = !done && tp === lit(strHex(typ))
        struct(
          when(done, off).otherwise(off + sz).cast(LongType).as("off"),
          when(pos >= 0, pos).when(hit, off).otherwise(lit(-1L)).as("pos"),
          (cnt + when(hit, 1L).otherwise(0L)).as("cnt"))
      })
  }

  /** Effective end of the box at `pos` — the same size-0/size-1
    * handling as [[mp4BoxScan]], for callers that descend into a
    * container box's children. (Children are still assumed to start at
    * `pos + 8`: a CONTAINER box that itself uses largesize would need
    * `pos + 16` — unsupported, stated here; leaf payload offsets below
    * share the assumption.) */
  private def mp4BoxEnd(hx: Column, pos: Column, outerEnd: Column): Column = {
    val sz32 = u32be(hx, pos)
    when(sz32 === 0, outerEnd.cast(LongType))
      .when(sz32 === 1, pos + u64be(hx, pos + 8))
      .otherwise(pos + sz32)
  }

  val containerMetaSchema: Seq[String] = Seq("media_id", "format",
    "n_tracks", "sample_rate", "duration_ms_r", "width", "height")

  /** Container metadata extraction — duration, resolution, sample rate,
    * track count — from the blob bytes alone, as codegen expressions:
    * WAV blobs take the RIFF chunk walk (fmt + data chunks; robust to
    * interleaved LIST chunks), MP4 blobs the box walk (moov → mvhd +
    * trak → tkhd; robust to free boxes). Walks are bounded at 8
    * boxes/chunks per level — beyond any blob these generators emit;
    * a production variant raises the bound, the shape is unchanged.
    * Duration is one exact integer division rendered at round-6. */
  def containerMeta(media: DataFrame): DataFrame = {
    val hx = col("__hx")
    val base = media.select(col("media_id"), hex(col("blob")).as("__hx"))
    val isWav = bytesAt(hx, lit(8L), 4) === lit(strHex("WAVE")) &&
      bytesAt(hx, lit(0L), 4) === lit(strHex("RIFF"))
    // WAV: fmt fields + data size → n_samples → duration
    val fmtPos = riffChunkPos(hx, "fmt ")
    val dataPos = riffChunkPos(hx, "data")
    val wavCh = u16le(hx, fmtPos + 10)
    val wavRate = u32le(hx, fmtPos + 12)
    val wavBits = u16le(hx, fmtPos + 22)
    val wavSamples = u32le(hx, dataPos + 4) / (wavCh * (wavBits / 8))
    // MP4: moov → mvhd (timescale, duration) + trak count + first tkhd.
    // Each level's position lands in a PROJECTION column before the
    // next level references it: the size-0/size-1 handling makes the
    // range end appear several times inside each scan lambda, and
    // nesting the raw Column trees through moov → trak → tkhd would
    // multiply them combinatorially (the staged form keeps every level
    // a plain attribute reference — linear tree, same runtime).
    val fileEnd = (length(hx) / 2).cast(LongType)
    val staged = base
      .withColumn("__end", fileEnd)
      .withColumn("__moovPos",
        mp4BoxScan(hx, lit(0L), col("__end"), "moov").getField("pos"))
      .withColumn("__moovEnd", mp4BoxEnd(hx, col("__moovPos"), col("__end")))
      .withColumn("__mvhdPos",
        mp4BoxScan(hx, col("__moovPos") + 8, col("__moovEnd"), "mvhd")
          .getField("pos"))
      .withColumn("__trak",
        mp4BoxScan(hx, col("__moovPos") + 8, col("__moovEnd"), "trak"))
      .withColumn("__trakPos", col("__trak").getField("pos"))
      .withColumn("__tkhdPos",
        mp4BoxScan(hx, col("__trakPos") + 8,
          mp4BoxEnd(hx, col("__trakPos"), col("__moovEnd")), "tkhd")
          .getField("pos"))
    val trakCnt = col("__trak").getField("cnt")
    val tkhdPos = col("__tkhdPos")
    val mvhdPos = col("__mvhdPos")
    val timescale = u32be(hx, mvhdPos + 8 + 12)
    val durTicks = u32be(hx, mvhdPos + 8 + 16)
    staged.select(
      col("media_id"),
      when(isWav, "wav").otherwise("mp4").as("format"),
      when(isWav, wavCh).otherwise(trakCnt)
        .cast(LongType).as("n_tracks"),
      when(isWav, wavRate).otherwise(0L).cast(LongType).as("sample_rate"),
      round(when(isWav,
          wavSamples.cast(DoubleType) * 1000.0 / wavRate.cast(DoubleType))
        .otherwise(
          durTicks.cast(DoubleType) * 1000.0 / timescale.cast(DoubleType)),
        6).as("duration_ms_r"),
      when(isWav, 0L)
        .otherwise(shiftright(u32be(hx, tkhdPos + 8 + 76), 16))
        .cast(LongType).as("width"),
      when(isWav, 0L)
        .otherwise(shiftright(u32be(hx, tkhdPos + 8 + 80), 16))
        .cast(LongType).as("height"))
  }
}
