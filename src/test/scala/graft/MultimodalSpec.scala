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
