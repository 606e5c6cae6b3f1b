package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, plus decode / feature-extract / resize / frame-sample
  * stages.
  *
  * Spark-side plumbing is real — binary columns, typed metadata structs,
  * partition-batched decode via `mapPartitions` over a `Dataset[T]` (the
  * Scala analogue of a vectorized Python `mapInPandas` decode stage), and
  * codegen'd native expressions for everything metadata-shaped. IMAGE
  * decode and resize are REAL (JDK `javax.imageio`: PNG/JPEG/GIF/BMP —
  * [[decodeImagePartitions]] / [[resizeImagePartitions]]), with the
  * deterministic `stubDecode*` byte-arithmetic kept both as the fallback
  * for unrecognized codecs and as the oracle-checkable surface (a SQL
  * engine can replay arithmetic, not a PNG parser). AUDIO/VIDEO decode
  * remains a stub — no codec in the JDK; swapping one in changes only
  * the function body, not the pipeline shape, schema, or partitioning.
  *
  * Scale posture (100 TB of media): payloads never shuffle — metadata is
  * derived in the scan stage and payloads are dropped before any
  * wide operation. Decode parallelism = input partitions; batch size is
  * governed by `spark.sql.files.maxPartitionBytes`, not row count.
  */
object Multimodal {

  /** Media kind from a numeric id — fixture helper to give the synthetic
    * corpus all three modalities deterministically. */
  def kindOf(id: Column): Column =
    when(pmod(id, lit(3)) === 0, "image")
      .when(pmod(id, lit(3)) === 1, "audio")
      .otherwise("video")

  /** The stub fallback's byte-length → (width, height) arithmetic —
    * ONE definition shared by the column expression
    * ([[stubDecodeMeta]]) and the JVM-side typed decode fallback, so
    * the documented "fallback equals stub" invariant cannot drift. */
  private[graft] def stubDims(payloadBytes: Long): (Int, Int) =
    (((payloadBytes * 7) % 512 + 128).toInt,
      ((payloadBytes * 13) % 384 + 96).toInt)

  /** STUB decode: typed metadata derived from payload bytes only (no real
    * codec in this environment). width/height/sample-rate/duration are
    * deterministic functions of byte length, so the stage is testable and
    * oracle-checkable; a real build replaces the arithmetic with a codec
    * call of the same signature. Native expressions -> whole-stage codegen,
    * no UDF. */
  def stubDecodeMeta(payload: Column, kind: Column): Column = {
    // long arithmetic: octet_length is int and n*13 overflows int for
    // payloads over ~165 MB (real video blobs are routinely larger)
    val n = octet_length(payload).cast("long")
    struct(
      (pmod(n * 7, lit(512)) + 128).cast("int").as("width"),
      (pmod(n * 13, lit(384)) + 96).cast("int").as("height"),
      when(kind === "audio", pmod(n, lit(3)) * 16000 + 16000)
        .otherwise(lit(null).cast("long")).as("sample_rate"),
      (n * 10).cast("long").as("duration_ms"),
      when(kind === "image", lit("png"))
        .when(kind === "audio", lit("wav"))
        .otherwise(lit("mp4")).as("format"))
  }

  /** Resize: fit (width, height) into maxW x maxH preserving aspect ratio,
    * integer arithmetic only (engine-portable, no float rounding drift). */
  def resizedDims(meta: Column, maxW: Int, maxH: Int): Column = {
    val w = meta.getField("width")
    val h = meta.getField("height")
    // scale = min(maxW/w, maxH/h) in floored 1/1000ths; never upscale.
    // Explicit floor() (not int-cast) so Spark and any SQL oracle agree on
    // rounding; operands are small ints so the double division is safe.
    val scaleMil = least(
      floor(lit(maxW) * 1000 / w), floor(lit(maxH) * 1000 / h), lit(1000L))
    struct(
      floor(w * scaleMil / 1000).cast("int").as("out_width"),
      floor(h * scaleMil / 1000).cast("int").as("out_height"))
  }

  /** Frame sampling offsets: one frame every `everyMs` over the clip. */
  def frameOffsets(durationMs: Column, everyMs: Int): Column =
    sequence(lit(0L), durationMs, lit(everyMs.toLong))

  /** STUB feature extraction: deterministic pseudo-embedding from payload
    * bytes (crc32 of payload + lane index, scaled to [0,1)). Shape and
    * types are what a real image encoder would produce. */
  def stubEmbedding(payload: Column, dim: Int): Column =
    transform(sequence(lit(0), lit(dim - 1)),
      i => (crc32(concat(payload, i.cast("string").cast("binary"))) % 1000L)
        .cast("double") / 1000.0)

  // ------------------------------------------------------- typed batch API

  /** Decoded record produced by the partition-batched decode stage. */
  case class DecodedMedia(media_id: Long, kind: String, n_bytes: Long,
                          width: Int, height: Int, checksum: Long)

  /** Image metadata from the REAL decode path ([[decodeImagePartitions]]):
    * `decoded` says whether a JDK codec recognized the payload; stub
    * fallbacks carry `format = "unknown"` and the deterministic
    * byte-arithmetic dims of [[stubDecodeMeta]]. */
  case class DecodedImage(media_id: Long, n_bytes: Long, decoded: Boolean,
                          format: String, width: Int, height: Int)

  /** Output of the real resize stage: a re-encoded PNG payload plus its
    * dimensions ([[resizeImagePartitions]]); rows a codec could not
    * decode pass through with `decoded = false` and a null payload. */
  case class ResizedImage(media_id: Long, decoded: Boolean,
                          out_width: Int, out_height: Int,
                          png: Array[Byte])

  /** Header-only image probe via the JDK's ImageIO plugin registry
    * (PNG/JPEG/GIF/BMP/WBMP ship with the JDK — no external codec):
    * format name and dimensions come from the image HEADER
    * (`reader.getWidth(0)`), never a full pixel decode — the right
    * shape for metadata extraction over 100 TB of media, where
    * decoding pixels to learn a width would be ~1000× the I/O. */
  def readImageHeader(bytes: Array[Byte]): Option[(String, Int, Int)] = {
    if (bytes == null || bytes.isEmpty) return None
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    // createImageInputStream returns null when no stream SPI is
    // registered — without this guard the finally's close() would NPE
    // and break the never-throws contract
    if (iis == null) return None
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis, true, true)
          Some((r.getFormatName.toLowerCase, r.getWidth(0), r.getHeight(0)))
        } finally r.dispose()
      }
    } catch { case scala.util.control.NonFatal(_) => None }
    finally iis.close()
  }

  /** Partition-batched REAL image decode: metadata via [[readImageHeader]]
    * for any payload a JDK codec recognizes, with the [[stubDecodeMeta]]
    * byte-arithmetic as the documented fallback for unknown codecs
    * (`decoded = false`, `format = "unknown"`) so heterogeneous corpora
    * flow through without a lossy filter. Same batch shape as
    * [[decodePartitions]]: one iterator per partition, payloads never
    * shuffle, ImageIO's disk cache disabled (decode stays in-memory). */
  def decodeImagePartitions(df: DataFrame, idCol: String,
                            payloadCol: String): Dataset[DecodedImage] = {
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val n = if (bytes == null) 0L else bytes.length.toLong
        readImageHeader(bytes) match {
          case Some((fmt, w, h)) =>
            DecodedImage(r.getLong(idIdx), n, decoded = true, fmt, w, h)
          case None =>
            val (w, h) = stubDims(n)
            DecodedImage(r.getLong(idIdx), n, decoded = false, "unknown",
              width = w, height = h)
        }
      }
    }(Encoders.product[DecodedImage])
  }

  /** Partition-batched REAL resize: full decode (this one reads pixels —
    * it must), aspect-preserving downscale into maxW × maxH using the
    * SAME floored-millis integer arithmetic as [[resizedDims]] (the two
    * paths agree on output dims by construction), smooth-scaled draw,
    * PNG re-encode. Never upscales. Undecodable payloads pass through
    * with `decoded = false` and a null png. */
  def resizeImagePartitions(df: DataFrame, idCol: String,
                            payloadCol: String, maxW: Int,
                            maxH: Int): Dataset[ResizedImage] = {
    require(maxW > 0 && maxH > 0, s"bad target $maxW x $maxH")
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val img =
          try {
            if (bytes == null || bytes.isEmpty) null
            else javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
          } catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) ResizedImage(id, decoded = false, 0, 0, null)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          // resizedDims' exact arithmetic: floored 1/1000ths, no upscale
          val scaleMil = math.min(1000L,
            math.min(maxW * 1000L / w, maxH * 1000L / h))
          val ow = math.max(1, (w * scaleMil / 1000L).toInt)
          val oh = math.max(1, (h * scaleMil / 1000L).toInt)
          val out = new java.awt.image.BufferedImage(ow, oh,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(
              java.awt.RenderingHints.KEY_INTERPOLATION,
              java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
            g.drawImage(img, 0, 0, ow, oh, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          ResizedImage(id, decoded = true, ow, oh, bos.toByteArray)
        }
      }
    }(Encoders.product[ResizedImage])
  }

  case class HashedImage(media_id: Long, decoded: Boolean, ahash: Long)

  /** Perceptual average-hash (aHash) per image: REAL decode, 8×8
    * integer block-average grayscale, one bit per cell against the
    * 64-cell mean — near-identical images (re-encodes, slight noise,
    * small crops) land within a few Hamming bits, so image-level
    * dedup composes with the existing machinery: exact dup =
    * hash-equality groupBy, near dup = the [[Dedup.simhashPairs]]
    * prefix-bucket + Hamming-filter pattern over the 64-bit hash.
    * The whole pipeline is floored integer arithmetic (luma =
    * (299r+587g+114b)/1000, strict > mean), so a given payload hashes
    * identically across runs and machines. Undecodable payloads pass
    * through with decoded = false, hash 0. */
  def imageAHash(df: DataFrame, idCol: String,
                 payloadCol: String): Dataset[HashedImage] = {
    val idIdx = df.schema.fieldIndex(idCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(idIdx)
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        val img =
          try {
            if (bytes == null || bytes.isEmpty) null
            else javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(bytes))
          } catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) HashedImage(id, decoded = false, 0L)
        else {
          val (w, h) = (img.getWidth, img.getHeight)
          val cells = new Array[Long](64)
          var j = 0
          while (j < 8) {
            var i = 0
            while (i < 8) {
              // integer block bounds cover every pixel exactly once
              // for dimensions >= 8; below 8 px the forced minimum
              // block width (x1 >= x0+1) makes neighboring cells
              // re-read the same pixels — still deterministic, the
              // hash just carries duplicated luma for tiny images
              val x0 = i * w / 8; val x1 = math.max(x0 + 1, (i + 1) * w / 8)
              val y0 = j * h / 8; val y1 = math.max(y0 + 1, (j + 1) * h / 8)
              var sum = 0L; var n = 0L
              var y = y0
              while (y < math.min(y1, h)) {
                var x = x0
                while (x < math.min(x1, w)) {
                  val rgb = img.getRGB(x, y)
                  sum += (299L * ((rgb >> 16) & 0xff) +
                    587L * ((rgb >> 8) & 0xff) +
                    114L * (rgb & 0xff)) / 1000L
                  n += 1; x += 1
                }
                y += 1
              }
              cells(j * 8 + i) = if (n == 0) 0L else sum / n
              i += 1
            }
            j += 1
          }
          val mean = cells.sum / 64
          var hash = 0L
          var k = 0
          while (k < 64) {
            if (cells(k) > mean) hash |= (1L << k)
            k += 1
          }
          HashedImage(id, decoded = true, hash)
        }
      }
    }(Encoders.product[HashedImage])
  }

  /** Image near-duplicate candidate pairs end to end: [[imageAHash]]
    * (real decode) composed with [[Dedup.hashBandPairs]]' multi-band
    * Hamming blocking over the 64-bit perceptual hash — re-encodes,
    * slight noise and small edits land within a few Hamming bits, so
    * with maxHamming < bands the banding finds EVERY such pair
    * (pigeonhole recall guarantee) while unrelated images (~32 bits
    * apart in expectation) are filtered. Undecodable payloads are
    * excluded (their hash-0 rows would all collide). Returns
    * (id_a, id_b, hamming). MultimodalSpec runs the precision/recall
    * QA gate over a deterministic re-encoded/noised fixture set —
    * spec-level because the DuckDB oracle cannot decode images, the
    * same honesty boundary as the decode stubs (q43/q44).
    *
    * Scale: hashes are computed once (the decode dominates; payloads
    * never shuffle — only (id, 8-byte hash) rows enter the banding),
    * then bands·n fixed fan-out with the usual maxBucket backstop. */
  def imageNearDupPairs(df: DataFrame, idCol: String, payloadCol: String,
                        bands: Int = 8, maxHamming: Int = 7,
                        maxBucket: Int = 4096): DataFrame =
    Dedup.hashBandPairs(
      imageAHash(df, idCol, payloadCol).where(col("decoded"))
        .toDF().select(col("media_id").as(idCol), col("ahash")),
      "ahash", idCol, bits = 64, bands = bands,
      maxHamming = maxHamming, maxBucket = maxBucket)

  /** Partition-batched decode over (id, kind, payload) rows — the Scala
    * analogue of a `mapInPandas` decode: one iterator per partition, so a
    * real codec could amortize model/codec init per partition exactly like
    * a Python worker would per batch. The per-row decode body is the STUB.
    */
  def decodePartitions(df: DataFrame, idCol: String, kindCol: String,
                       payloadCol: String): Dataset[DecodedMedia] = {
    val idIdx = df.schema.fieldIndex(idCol)
    val kindIdx = df.schema.fieldIndex(kindCol)
    val payloadIdx = df.schema.fieldIndex(payloadCol)
    df.mapPartitions { rows =>
      // per-partition init happens here (codec handles, model weights, ...)
      val crc = new java.util.zip.CRC32()
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](payloadIdx)
        crc.reset(); crc.update(bytes)
        val n = bytes.length.toLong
        val (w, h) = stubDims(n) // STUB: real codec here
        DecodedMedia(
          r.getLong(idIdx), r.getString(kindIdx), n,
          width = w, height = h,
          checksum = crc.getValue)
      }
    }(Encoders.product[DecodedMedia])
  }
}
