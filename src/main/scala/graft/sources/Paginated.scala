package graft.sources

/** Driver-side paginated-extract connector (SURVEY §2.1 S4, §2.10 V1/V3).
  *
  * The reference pulls a crawler REST API in fixed-size chunks with a
  * page-count probe, per-chunk retry-skip, a throttle, and alert-on-error
  * (reference: Audisto/audisto.py:88-134). This is connector code, not an
  * engine operator — transport is injected, so it is testable without a
  * network and swappable for any HTTP client. The fetched chunks land as
  * local files / rows and enter the engine through the normal CSV/JSON
  * scans (S1/S3/S5).
  *
  * For in-engine parallel fetch at scale, the same ChunkSpec list is the
  * natural `InputPartition` set of a DataSourceV2 table — one partition
  * per chunk; this sequential driver loop is the reference-shaped
  * fallback.
  */
object Paginated {

  type Alert = String => Unit

  final case class ChunkSpec(index: Int, offset: Long, limit: Long)

  /** C15: ceil(total / chunkSize) chunk windows. */
  def chunkSpecs(totalRows: Long, chunkSize: Long): Seq[ChunkSpec] = {
    require(chunkSize > 0)
    val n = ((totalRows + chunkSize - 1) / chunkSize).toInt
    (0 until n).map(i => ChunkSpec(i, i.toLong * chunkSize,
      math.min(chunkSize, totalRows - i.toLong * chunkSize)))
  }

  /** V1: non-200 probe status -> alert, abort extract (reference:
    * audisto.py:63-79 returns early after alerting). */
  def statusGate(status: Int, what: String, alert: Alert): Boolean = {
    val ok = status == 200
    if (!ok) alert(s"$what returned HTTP $status")
    ok
  }

  final case class ExtractResult[T](rows: Seq[T], skippedChunks: Seq[ChunkSpec])

  /** V3: fetch every chunk with per-chunk retry; a chunk that keeps
    * failing is alerted and SKIPPED (the reference's `continue`), never
    * fatal. `throttle` is called between chunk fetches (the reference
    * sleeps 1 s; tests inject a no-op). */
  def fetchAll[T](total: Long, chunkSize: Long,
                  fetch: ChunkSpec => Either[String, Seq[T]],
                  alert: Alert = _ => (),
                  retriesPerChunk: Int = 2,
                  throttle: () => Unit = () => ()): ExtractResult[T] = {
    val specs = chunkSpecs(total, chunkSize)
    val out = Seq.newBuilder[T]
    val skipped = Seq.newBuilder[ChunkSpec]
    specs.foreach { spec =>
      var attempt = 0
      var done = false
      while (!done && attempt <= retriesPerChunk) {
        fetch(spec) match {
          case Right(rows) =>
            out ++= rows; done = true
          case Left(err) =>
            attempt += 1
            if (attempt > retriesPerChunk) {
              alert(s"chunk ${spec.index} failed after $attempt attempts: $err")
              skipped += spec
            }
        }
      }
      throttle()
    }
    ExtractResult(out.result(), skipped.result())
  }
}
