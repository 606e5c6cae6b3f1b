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
  * codegen'd native expressions for everything metadata-shaped. The DECODE
  * ITSELF IS A STUB: the container ships no image/audio codecs, so
  * `stubDecode*` derive deterministic fake values from the payload bytes.
  * Swapping in a real codec changes only the function body, not the
  * pipeline shape, schema, or partitioning.
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
        DecodedMedia(
          r.getLong(idIdx), r.getString(kindIdx), n,
          width = ((n * 7) % 512 + 128).toInt,   // STUB: real codec here
          height = ((n * 13) % 384 + 96).toInt,  // STUB
          checksum = crc.getValue)
      }
    }(Encoders.product[DecodedMedia])
  }
}
