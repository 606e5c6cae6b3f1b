package graft

import org.apache.spark.sql.functions._
import graft.ops._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private val media = Seq(
    (0L, "abcdefgh"),            // image (0 % 3)
    (1L, "0123456789abcdef"),    // audio
    (2L, "xyz")                  // video
  ).toDF("media_id", "text")
    .withColumn("payload", col("text").cast("binary"))
    .withColumn("kind", Multimodal.kindOf(col("media_id")))

  test("kindOf cycles image/audio/video") {
    assert(rows(media.select("kind")).flatten === Seq("image", "audio", "video"))
  }

  test("stubDecodeMeta: deterministic dims, audio-only sample rate") {
    val m = media.withColumn("meta",
      Multimodal.stubDecodeMeta(col("payload"), col("kind")))
    val got = m.select(col("meta.width"), col("meta.sample_rate"),
      col("meta.duration_ms"), col("meta.format")).collect()
    // n=8: width = (8*7)%512+128 = 184; duration = 80
    assert(got(0).getInt(0) === 184)
    assert(got(0).isNullAt(1)) // image: no sample rate
    assert(got(0).getLong(2) === 80L)
    assert(got(0).getString(3) === "png")
    // n=16 audio: sample_rate = (16%3)*16000+16000 = 32000
    assert(got(1).getLong(1) === 32000L)
    assert(got(2).getString(3) === "mp4")
  }

  test("resizedDims never upscales and preserves aspect ratio") {
    val m = media.withColumn("meta",
        Multimodal.stubDecodeMeta(col("payload"), col("kind")))
      .withColumn("r", Multimodal.resizedDims(col("meta"), 320, 240))
      .select(col("meta.width"), col("meta.height"),
        col("r.out_width"), col("r.out_height"))
    m.collect().foreach { r =>
      val (w, h, ow, oh) = (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
      assert(ow <= 320 && oh <= 240)
      assert(ow <= w && oh <= h) // never upscale
      // aspect preserved within integer-floor tolerance
      assert(math.abs(ow.toDouble / w - oh.toDouble / h) < 0.01)
    }
  }

  test("frameOffsets covers the clip at the sampling interval") {
    val df = Seq(2100L).toDF("dur")
      .select(Multimodal.frameOffsets(col("dur"), 500).as("o"))
    assert(rows(df).head.head === Seq(0L, 500L, 1000L, 1500L, 2000L))
  }

  test("decodePartitions: typed batch decode matches the expression stub") {
    val out = Multimodal.decodePartitions(media, "media_id", "kind", "payload")
      .collect().sortBy(_.media_id)
    assert(out.map(_.n_bytes).toSeq === Seq(8L, 16L, 3L))
    // width formula consistent with stubDecodeMeta
    assert(out(0).width === 184)
    // checksum is a real CRC32 of the payload bytes
    val crc = new java.util.zip.CRC32(); crc.update("abcdefgh".getBytes)
    assert(out(0).checksum === crc.getValue)
  }

  // deterministic synthetic images, generated in-test (no binary
  // fixture in the repo): a wxh gradient encoded by the JDK itself
  private def syntheticImage(w: Int, h: Int, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (x <- 0 until w; y <- 0 until h)
      img.setRGB(x, y, ((x * 31 + y * 17) % 256) << 8)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, bos)
    bos.toByteArray
  }

  test("imageAHash: stable under re-encode/noise, far for different images") {
    // a SMOOTH diagonal ramp (aHash's home turf — wrap-around
    // gradients put every cell at the global mean, where no
    // perceptual hash is stable); the same ramp with slight noise;
    // and the inverted ramp as different content
    def ramp(w: Int, h: Int, noise: Boolean = false,
             invert: Boolean = false): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until w; y <- 0 until h) {
        val base = (x * 255 / w + y * 255 / h) / 2
        val v0 = if (invert) 255 - base else base
        val v = (v0 + (if (noise && (x + y) % 13 == 0) 6 else 0)).min(255)
        img.setRGB(x, y, v << 8)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val rows = Seq(
      (1L, ramp(64, 48)),
      (2L, ramp(64, 48)),                // byte-identical dup
      (3L, ramp(64, 48, noise = true)),  // near dup
      (4L, ramp(64, 48, invert = true)), // different content
      (5L, "garbage".getBytes("UTF-8"))  // undecodable
    ).toDF("media_id", "payload")
    val h = Multimodal.imageAHash(rows, "media_id", "payload")
      .collect().map(r => r.media_id -> r).toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(h(1L).decoded && h(1L).ahash === h(2L).ahash)
    assert(ham(h(1L).ahash, h(3L).ahash) <= 8,
      s"near-dup hamming ${ham(h(1L).ahash, h(3L).ahash)}")
    assert(ham(h(1L).ahash, h(4L).ahash) >= 20,
      s"different-image hamming ${ham(h(1L).ahash, h(4L).ahash)}")
    assert(!h(5L).decoded && h(5L).ahash === 0L)
    // exact image dedup is a plain groupBy on the hash
    val dupGroups = Multimodal.imageAHash(rows, "media_id", "payload")
      .where(col("decoded"))
      .groupBy("ahash").count().where(col("count") > 1).count()
    assert(dupGroups === 1L)
  }

  test("image near-dup QA gate: banded aHash pairs hit recall and " +
      "precision floors on a re-encoded/noised fixture") {
    // 10 distinct base images (deterministic 8x8 blocky luma patterns
    // from an LCG — aHash cells = the block pattern, so distinct seeds
    // sit ~32 Hamming bits apart), each in three variants: original
    // PNG, lossless BMP re-encode, and per-pixel noised PNG. Truth =
    // same-base pairs (30); everything else is unrelated content.
    // Oracle-side DuckDB cannot decode images, so this gate is the
    // spec-level check, as with q43/q44.
    def blocky(seed: Int, noise: Boolean, format: String): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(64, 64,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (x <- 0 until 64; y <- 0 until 64) {
        val cell = (y / 8) * 8 + (x / 8)
        // splitmix-style finalizer: well-mixed deterministic bit per
        // (seed, cell) — a plain LCG left adjacent seeds correlated
        // enough to leak cross-base pairs under Hamming 7
        var r = seed * 0x9E3779B97F4A7C15L + cell * 0xBF58476D1CE4E5B9L
        r ^= r >>> 27; r *= 0x94D049BB133111EBL; r ^= r >>> 31
        val base = if ((r & 1) == 1) 220 else 20
        val v = (base + (if (noise && (x + y) % 7 == 0) 5 else 0)).min(255)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, format, bos)
      bos.toByteArray
    }
    val imgs = (0 until 10).flatMap { b =>
      Seq((b * 3 + 0L, blocky(b, noise = false, "png")),
        (b * 3 + 1L, blocky(b, noise = false, "bmp")),
        (b * 3 + 2L, blocky(b, noise = true, "png")))
    }.toDF("media_id", "payload")
    val cand = Multimodal.imageNearDupPairs(imgs, "media_id", "payload",
      bands = 8, maxHamming = 7).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = (0 until 10).flatMap { b =>
      val ids = Seq(b * 3 + 0L, b * 3 + 1L, b * 3 + 2L)
      for (i <- ids; j <- ids if i < j) yield (i, j)
    }.toSet
    val hit = cand intersect truth
    val recall = hit.size.toDouble / truth.size
    val precision =
      if (cand.isEmpty) 0.0 else hit.size.toDouble / cand.size
    info(s"image near-dup gate: recall=$recall precision=$precision " +
      s"(${cand.size} candidates / ${truth.size} true pairs)")
    assert(recall >= 0.9, s"recall floor violated: $recall")
    assert(precision >= 0.9, s"precision floor violated: $precision")
  }

  test("decodeImagePartitions: REAL png/jpeg header decode, stub fallback") {
    val rows = Seq(
      (10L, syntheticImage(64, 48, "png")),
      (11L, syntheticImage(120, 30, "jpg")),
      (12L, "not an image at all".getBytes("UTF-8")) // unknown codec
    ).toDF("media_id", "payload")
    val out = Multimodal.decodeImagePartitions(rows, "media_id", "payload")
      .collect().sortBy(_.media_id)
    assert(out(0).decoded && out(0).format === "png" &&
      out(0).width === 64 && out(0).height === 48)
    assert(out(1).decoded && out(1).format.startsWith("jp") &&
      out(1).width === 120 && out(1).height === 30)
    // fallback row: stubDecodeMeta arithmetic on n=19 bytes
    assert(!out(2).decoded && out(2).format === "unknown" &&
      out(2).width === ((19L * 7) % 512 + 128).toInt &&
      out(2).height === ((19L * 13) % 384 + 96).toInt)
  }

  test("resizeImagePartitions: real downscale, dims match resizedDims") {
    val rows = Seq(
      (20L, syntheticImage(640, 480, "png")),
      (21L, syntheticImage(100, 50, "png")),   // under the cap: untouched
      (22L, Array[Byte](1, 2, 3))              // undecodable
    ).toDF("media_id", "payload")
    val out = Multimodal.resizeImagePartitions(rows, "media_id", "payload",
        maxW = 320, maxH = 240)
      .collect().sortBy(_.media_id)
    assert(out(0).decoded && out(0).out_width === 320 &&
      out(0).out_height === 240)
    assert(out(1).decoded && out(1).out_width === 100 &&
      out(1).out_height === 50) // never upscale
    assert(!out(2).decoded && out(2).png == null)
    // the resized payload is a real PNG that decodes to the claimed dims
    val hdr = Multimodal.readImageHeader(out(0).png)
    assert(hdr === Some(("png", 320, 240)))
    // and the integer arithmetic agrees with the column-expression path
    val dims = Seq((640, 480)).toDF("width", "height")
      .select(Multimodal.resizedDims(
        struct(col("width"), col("height")), 320, 240).as("r"))
      .select("r.out_width", "r.out_height").collect().head
    assert((dims.getInt(0), dims.getInt(1)) === (320, 240))
  }

  test("stubEmbedding yields a fixed-dim deterministic vector in [0,1)") {
    val e = media.select(Multimodal.stubEmbedding(col("payload"), 8).as("e"))
    val vecs = e.collect().map(_.getSeq[Double](0))
    assert(vecs.forall(_.length === 8))
    assert(vecs.forall(_.forall(v => v >= 0.0 && v < 1.0)))
    // determinism: same payload -> same vector
    val again = media.select(Multimodal.stubEmbedding(col("payload"), 8).as("e"))
      .collect().map(_.getSeq[Double](0))
    assert(vecs.toSeq === again.toSeq)
  }
}
