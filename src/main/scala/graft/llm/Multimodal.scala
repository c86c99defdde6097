package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata. The Spark-side plumbing — schema, partitioning, batch
  * shape, frame expansion — is real and tested. IMAGE decode is REAL for
  * every container the JDK ships a reader for (PNG, JPEG, BMP, GIF):
  * [[ImageIoCodec]] encodes grayscale rasters to actual format bytes and
  * decodes arbitrary payloads back to a pixel grid by container sniffing —
  * see [[decodeGrayGrid]]. AUDIO decode is REAL for WAV/PCM16 through the
  * JDK's `javax.sound.sampled` — see [[WavCodec]]/[[audioFeatures]]. Only
  * VIDEO remains a STUB (the JDK ships no video codec and there is no
  * ffmpeg/JNI in this container): `StubCodec.decode` derives a
  * deterministic fake feature vector from the payload bytes, and is the
  * one function a deployment swaps for a real media decoder.
  *
  * Scale notes: payloads never pass through a shuffle — every operator here
  * is a per-partition map; the only wide operation a media pipeline needs
  * (dedup by content hash) runs on the 16-byte hash, not the blob. Decoding
  * runs via `mapPartitions` so a real decoder amortizes per-partition init
  * (codec contexts, GPU handles) across rows — the same batching contract as
  * arrow-batched UDFs. */
object Multimodal {

  /** media table schema: one row per asset, payload opaque. */
  val mediaType: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false), // image | audio | video
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", StructType(Seq(
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", IntegerType, nullable = true),
      StructField("sample_rate", IntegerType, nullable = true)
    )), nullable = false)
  ))

  final case class MediaMeta(width: Option[Int], height: Option[Int],
                             duration_ms: Option[Int], sample_rate: Option[Int])
  final case class MediaRow(media_id: Long, kind: String, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String, n_bytes: Long,
                                 content_hash: String, features: Array[Float])

  /** Byte-level stats + content hash — pure codegen'd columns, no decode. */
  def byteStats(media: DataFrame): DataFrame =
    media.select(
      col("media_id"), col("kind"),
      octet_length(col("payload")).cast("long").as("n_bytes"),
      md5(col("payload")).as("content_hash"),
      col("meta"))

  /** Exact media dedup: groupBy the 16-byte content hash (never the blob). */
  def dedupExact(media: DataFrame): DataFrame =
    byteStats(media)
      .groupBy(col("content_hash"))
      .agg(min(col("media_id")).as("keep_id"), count(lit(1)).as("n_copies"))

  /** THE STUB — AUDIO/VIDEO ONLY: a real deployment replaces this object
    * with an ffmpeg/JNI codec binding. Deterministic fake decode — features
    * are carved from md5 of the payload so tests and oracles can reproduce
    * them. Image kinds never route here: [[ImageIoCodec]] decodes
    * PNG/JPEG/BMP/GIF for real through the JDK. */
  object StubCodec {
    /** ??? in spirit — audio/video decode cannot be real in this container. */
    def decode(kind: String, payload: Array[Byte], dim: Int): Array[Float] = {
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(dim) { i =>
        val h = md.digest(payload ++ Array(i.toByte, kind.length.toByte))
        // 4 bytes → [0,1) float; deterministic across JVMs
        val v = ((h(0) & 0xffL) << 24 | (h(1) & 0xffL) << 16 |
                 (h(2) & 0xffL) << 8 | (h(3) & 0xffL)).toFloat
        v / (1L << 32).toFloat
      }
    }
  }

  /** Feature extraction with the mapPartitions batch shape: per-partition
    * init happens once (the `md` allocation stands in for codec/GPU setup),
    * then rows stream through. Dispatch happens ON KIND inside the swap
    * point: `image` payloads decode FOR REAL through [[ImageIoCodec]]
    * (container-sniffed — PNG/JPEG/BMP/GIF), with features = the leading
    * `dim` gray levels scaled to [0,1); an undecodable image payload fails
    * the task loudly (quarantine upstream, never silently skip). Audio and
    * video route to [[StubCodec]] — the one branch a deployment swaps for
    * an ffmpeg binding. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int)
                     (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // real decoder: open codec context here, once per partition
      rows.map { r =>
        val feats = r.kind match {
          case "image" =>
            val (_, _, px) = ImageIoCodec.decodeGray(r.payload)
            Array.tabulate(dim)(i => if (i < px.length) px(i) / 256f else 0f)
          case _ => StubCodec.decode(r.kind, r.payload, dim)
        }
        val md = java.security.MessageDigest.getInstance("MD5")
        val hash = md.digest(r.payload).map("%02x".format(_)).mkString
        MediaFeatures(r.media_id, r.kind, r.payload.length.toLong, hash, feats)
      }
    }
  }

  /** REAL image codec on the JDK's `javax.imageio` — no external media
    * library. Grayscale-only by design: the perceptual pipeline (dHash,
    * near-dup banding) consumes a single luminance channel, and TYPE_BYTE_GRAY
    * keeps the raster→grid mapping exact (no colorspace round-off to drift
    * the hash between encode and decode). Covers every container the JDK
    * ships a reader for — PNG, JPEG, BMP, GIF; decode sniffs the container
    * from the payload bytes, so one decode path serves mixed corpora. */
  object ImageIoCodec {
    /** Formats whose gray round-trip is BIT-EXACT (probed: a TYPE_BYTE_GRAY
      * raster survives encode+decode with zero error; GIF returns an
      * indexed raster whose gray conversion is exact). JPEG is NOT here —
      * lossy by construction, tolerance-gate its round-trips instead. */
    val LosslessFormats: Set[String] = Set("png", "bmp", "gif")

    /** Encode a row-major w×h grid of gray levels (each 0..255, enforced —
      * an out-of-range level would wrap through the byte raster and silently
      * corrupt the perceptual hash) into actual image bytes in `format`
      * (png | bmp | gif | jpg). JPEG writes at quality 1.0 — near-unity
      * quantization keeps the gray DCT error within a few levels, but it is
      * still lossy: perceptual-exact pipelines use a [[LosslessFormats]]
      * container. */
    def encodeGray(px: Array[Int], w: Int, h: Int, format: String): Array[Byte] = {
      require(px.length == w * h, s"grid ${px.length} != $w x $h")
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var i = 0
      while (i < px.length) {
        require(px(i) >= 0 && px(i) <= 255, s"gray level out of range: ${px(i)}")
        raster.setSample(i % w, i / w, 0, px(i)); i += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      format.toLowerCase match {
        case f if LosslessFormats(f) =>
          require(javax.imageio.ImageIO.write(img, f, bos), s"no $f writer")
        case "jpg" | "jpeg" =>
          val wr = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
          val p = wr.getDefaultWriteParam
          p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
          p.setCompressionQuality(1.0f)
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          try {
            wr.setOutput(ios)
            wr.write(null, new javax.imageio.IIOImage(img, null, null), p)
          } finally { ios.close(); wr.dispose() }
        case other => sys.error(s"unsupported image format: $other")
      }
      bos.toByteArray
    }

    /** PNG form of [[encodeGray]] (the original fixture producer). */
    def encodeGrayPng(px: Array[Int], w: Int, h: Int): Array[Byte] =
      encodeGray(px, w, h, "png")

    /** Back-compat alias for [[decodeGray]] — the decode always sniffed the
      * container, so it was never PNG-specific. */
    def decodeGrayPng(bytes: Array[Byte]): (Int, Int, Array[Int]) =
      decodeGray(bytes)

    /** Decode image bytes (container sniffed: PNG/JPEG/BMP/GIF) back to
      * (w, h, row-major gray grid). Fails loudly on undecodable payloads —
      * a training pipeline must quarantine, not silently skip, corrupt
      * assets. Non-gray inputs are converted through the AWT gray
      * colorspace first (band 0 of a gray raster IS luminance). */
    def decodeGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
      val img0 = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img0 != null, "undecodable image payload")
      val img =
        if (img0.getType == java.awt.image.BufferedImage.TYPE_BYTE_GRAY) img0
        else {
          val g = new java.awt.image.BufferedImage(
            img0.getWidth, img0.getHeight, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          val gfx = g.createGraphics()
          try gfx.drawImage(img0, 0, 0, null) finally gfx.dispose()
          g
        }
      val w = img.getWidth; val h = img.getHeight
      val raster = img.getRaster
      val px = new Array[Int](w * h)
      var i = 0
      while (i < px.length) { px(i) = raster.getSample(i % w, i / w, 0); i += 1 }
      (w, h, px)
    }
  }

  final case class PngAsset(media_id: Long, payload: Array[Byte])
  final case class GrayGrid(media_id: Long, w: Int, h: Int, px: Array[Int])

  /** Encode (id, row-major gray grid) rows into REAL image payloads — the
    * test-fixture producer and the write-side of an image sink. `format`
    * picks the container PER ROW from the id (a corpus is rarely one
    * format; the constant function gives the single-format form). Same
    * mapPartitions batch shape as [[extractFeatures]]. */
  def encodeGrayGridAssets(grid: DataFrame, w: Int, h: Int,
                           format: Long => String,
                           idCol: String = "vec_id", pxCol: String = "px")
                          (implicit spark: SparkSession): Dataset[PngAsset] = {
    import spark.implicits._
    grid.select(col(idCol).cast("long"), col(pxCol))
      .as[(Long, Array[Int])]
      .mapPartitions(_.map { case (id, px) =>
        PngAsset(id, ImageIoCodec.encodeGray(px, w, h, format(id)))
      })
  }

  /** PNG-only form of [[encodeGrayGridAssets]] (the original producer). */
  def encodePngGrid(grid: DataFrame, w: Int, h: Int,
                    idCol: String = "vec_id", pxCol: String = "px")
                   (implicit spark: SparkSession): Dataset[PngAsset] =
    encodeGrayGridAssets(grid, w, h, _ => "png", idCol, pxCol)

  /** REAL decode: image payload bytes (container SNIFFED per row — a mixed
    * PNG/JPEG/BMP/GIF corpus decodes through this one path) → (id, w, h,
    * pixel grid), via `javax.imageio` inside the documented mapPartitions
    * swap point (the reader-plugin registry initializes once per JVM;
    * per-partition init is where a heavier codec would open its context).
    * Feed the result to [[dHash]] for perceptual near-dup — the full image
    * pipeline with no stub in the path. Payloads reach here WITHOUT
    * crossing a shuffle. */
  def decodeGrayGrid(media: Dataset[PngAsset])
                    (implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.mapPartitions(_.map { a =>
      val (w, h, px) = ImageIoCodec.decodeGray(a.payload)
      GrayGrid(a.media_id, w, h, px)
    }).toDF()
  }

  /** Quantize a float vector into a grayscale pixel grid: each component is
    * mapped from roughly [-1, 1] to an integer gray level via
    * `floor((v + 1) · 127.5)`. The embedding tables stand in for decoded
    * image rasters in this container (no codec libs — see StubCodec); with a
    * real decoder the same downstream hash consumes its byte grid directly.
    * Pure per-row `transform`, no shuffle. */
  def grayscaleGrid(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol),
      transform(col(vecCol), v =>
        floor((v.cast("double") + lit(1.0)) * lit(127.5)).cast("int")).as("px"))

  /** dHash perceptual fingerprint over a row-major w×h grayscale grid: bit
    * (r·(w−1)+c) is set iff px[r][c] < px[r][c+1] — the classic
    * difference-hash (gradient direction per adjacent pixel pair), so
    * near-identical images land within a few bits of each other and exact
    * Hamming distance measures perceptual change. (w−1)·h must be ≤ 63 so
    * the fingerprint packs into one BIGINT. One `aggregate` HOF per row —
    * a single map pass, no shuffle, no UDF. Cache (or write) the result
    * before fanning it out into multi-reference plans like banded
    * retrieval — downstream projection collapse would re-evaluate the
    * 56-step aggregate once per reference otherwise. */
  def dHash(grid: DataFrame, w: Int = 8, h: Int = 8,
            idCol: String = "vec_id", pxCol: String = "px"): DataFrame = {
    val bits = (w - 1) * h
    require(bits <= 63, s"dHash bits $bits must fit a signed 64-bit value")
    // a short grid would read past the array end: with ANSI off element_at
    // yields NULL and the comparison's 0-branch silently CLEARS the high
    // bits, collapsing unrelated images into one Hamming ball — fail the
    // row loudly at the API boundary instead
    val guarded = when(size(col(pxCol)) < w * h,
      raise_error(concat(lit(s"dHash needs a $w x $h grid, got "),
        size(col(pxCol)).cast("string"), lit(" pixels"))).cast("long"))
    grid.select(col(idCol), guarded.otherwise(expr(
      s"""aggregate(sequence(0, ${bits - 1}), CAST(0 AS BIGINT),
         |  (acc, i) -> acc + IF(
         |    element_at($pxCol, CAST((i div ${w - 1}) * $w + (i % ${w - 1}) + 1 AS INT))
         |      < element_at($pxCol, CAST((i div ${w - 1}) * $w + (i % ${w - 1}) + 2 AS INT)),
         |    shiftleft(CAST(1 AS BIGINT), i), CAST(0 AS BIGINT)))""".stripMargin))
      .as("dhash"))
  }

  /** Frame sampling plumbing for video/audio: expand each asset into
    * (media_id, frame_no, offset_ms) rows every `everyMs` — pure Catalyst
    * (sequence + posexplode), so at scale it's a codegen'd generator, and the
    * per-frame decode joins in afterwards via extractFeatures. */
  def frameSample(media: DataFrame, everyMs: Int): DataFrame =
    media
      .where(col("meta.duration_ms").isNotNull)
      .select(col("media_id"), col("kind"),
        posexplode(sequence(lit(0), greatest(col("meta.duration_ms") - 1, lit(0)), lit(everyMs)))
          .as(Seq("frame_no", "offset_ms")))

  /** REAL image downscale by an integer factor: f×f box mean over the
    * decoded grid ([[decodeGrayGrid]]'s output shape), in EXACT integer
    * arithmetic (sum div f² — no float resampling drift, so an oracle can
    * recompute it bit-for-bit), expressed entirely in codegen'd
    * higher-order array functions — no UDF, and the pixel array never
    * shuffles (pure per-row projection). Rows smaller than the factor are
    * dropped (no partial boxes); trailing right/bottom pixels beyond the
    * last full box are cropped, the standard box-filter convention. */
  def downscaleGrayGrid(decoded: DataFrame, f: Int): DataFrame = {
    require(f >= 1 && f <= 8, s"factor must be in [1, 8], got $f")
    // `div` yields LONG in Spark SQL, so `j` (and the index arithmetic) is
    // BIGINT — element_at needs the explicit INT cast
    val terms = (for (dy <- 0 until f; dx <- 0 until f) yield
      s"element_at(px, CAST(((j div (w div $f)) * $f + $dy) * w + " +
        s"(j % (w div $f)) * $f + $dx + 1 AS INT))")
      .mkString(" + ")
    decoded
      .where(col("w") >= f && col("h") >= f)
      .select(col("media_id"),
        expr(s"CAST(w div $f AS INT)").as("out_w"),
        expr(s"CAST(h div $f AS INT)").as("out_h"),
        expr(s"transform(sequence(0, (w div $f) * (h div $f) - 1), j -> " +
          s"CAST(($terms) div ${f * f} AS INT))").as("out_px"))
      .select(col("media_id"), col("out_w").as("w"), col("out_h").as("h"),
        col("out_px").as("px"))
  }

  /** REAL audio codec — WAV/PCM16 mono through the JDK's
    * `javax.sound.sampled` (the audio sibling of [[ImageIoCodec]]): encode
    * writes an actual RIFF/WAVE container; decode routes the bytes through
    * `AudioSystem`'s parser — container sniffing, header validation, frame
    * framing, the same code path a JVM service runs on real uploads — so a
    * corrupt header or a mis-framed data chunk fails HERE, not as silent
    * garbage features. Video stays the honest [[StubCodec]] (the JDK ships
    * no video codec; a deployment swaps in an ffmpeg/JNI binding). */
  object WavCodec {
    /** Mono PCM16 samples → a complete RIFF/WAVE container (44-byte
      * canonical header + little-endian frames). */
    def encodePcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      require(sampleRate > 0, s"sampleRate must be positive, got $sampleRate")
      val dataLen = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(1) // PCM, mono
        .putInt(sampleRate).putInt(sampleRate * 2)
        .putShort(2).putShort(16) // block align, bits/sample
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

    /** Any WAV payload → (sampleRate, mono PCM16 samples). The JDK parses
      * and validates the container; non-mono-PCM16LE formats are rejected
      * loudly rather than misread. */
    def decodePcm16(bytes: Array[Byte]): (Int, Array[Short]) = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val f = in.getFormat
        require(f.getEncoding == javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED &&
          f.getSampleSizeInBits == 16 && f.getChannels == 1 && !f.isBigEndian,
          s"expected mono PCM16LE wav, got $f")
        val raw = in.readAllBytes()
        val bb = java.nio.ByteBuffer.wrap(raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        val out = new Array[Short](raw.length / 2)
        var i = 0
        while (i < out.length) { out(i) = bb.getShort(i * 2); i += 1 }
        (f.getSampleRate.toInt, out)
      } finally in.close()
    }
  }

  /** Real audio features off JDK-decoded PCM, in integer/IEEE-exact DSP so
    * an oracle can recompute them from the sample definition alone:
    * duration (integer ms), peak |amplitude|, strict zero crossings
    * (s_{i−1}·s_i < 0 — integer product, no epsilon), and RMS =
    * sqrt(Σs²/n) where Σs² is an exact integer (exact in double up to
    * ~8M samples of full-scale PCM16) and the divide+sqrt are IEEE-defined
    * — bit-reproducible across engines. mapPartitions: decoder init is
    * per-partition, payloads never shuffle (only the feature row moves). */
  def audioFeatures(media: DataFrame): DataFrame = {
    val sess = media.sparkSession
    import sess.implicits._
    media.select(col("media_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, payload) =>
          val (rate, s) = WavCodec.decodePcm16(payload)
          var zc = 0L; var peak = 0L; var sumSq = 0L
          var i = 0
          while (i < s.length) {
            val v = s(i).toLong
            if (i > 0 && s(i - 1).toLong * v < 0) zc += 1
            val a = math.abs(v); if (a > peak) peak = a
            sumSq += v * v
            i += 1
          }
          val n = s.length.toLong
          (id, rate, n, n * 1000L / rate, peak, zc,
            if (n == 0) 0.0 else math.sqrt(sumSq.toDouble / n))
        }
      }
      .toDF("media_id", "sample_rate", "n_samples", "duration_ms",
        "peak", "zero_crossings", "rms")
  }

  /** Resize plumbing: metadata transform only (payload stays opaque until a
    * real codec is bound); records the target box, preserving aspect ratio. */
  def resizePlan(media: DataFrame, maxSide: Int): DataFrame = {
    val w = col("meta.width").cast("double")
    val h = col("meta.height").cast("double")
    val scale = least(lit(maxSide) / greatest(w, h), lit(1.0))
    media.where(col("meta.width").isNotNull && col("meta.height").isNotNull)
      .select(col("media_id"), col("kind"),
        col("meta.width").as("src_w"), col("meta.height").as("src_h"),
        round(w * scale).cast("int").as("dst_w"),
        round(h * scale).cast("int").as("dst_h"))
  }
}
