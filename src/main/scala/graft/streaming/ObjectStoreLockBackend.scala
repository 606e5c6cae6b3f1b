package graft.streaming

import java.nio.charset.StandardCharsets

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

/** The minimal conditional-write surface a flat object store must
  * offer for a safe lease, factored out so the lock logic is written
  * ONCE ([[ObjectStoreLockBackend]]) and a production backend only
  * binds these four verbs to its store's API. Every verb must be
  * ATOMIC against concurrent callers on the same key — which is
  * exactly what the stores' conditional-request APIs provide:
  *
  *  - `putIfAbsent` — S3 `PutObject` with `If-None-Match: *`
  *    (conditional writes, AWS 2024+), GCS insert with
  *    `ifGenerationMatch=0`, Azure Blob `Put Blob` with
  *    `If-None-Match: *`.
  *  - `putIfMatches` — S3 `PutObject` with `If-Match: <etag>`, GCS
  *    `ifGenerationMatch=<gen>`, Azure `If-Match`. "Matches" is
  *    keyed by content: an etag of an unmultipart PUT is the
  *    content's md5, and a generation pins content exactly — which
  *    is why [[ObjectStoreLockBackend]] makes every heartbeat CHANGE
  *    the content (a beat serial), so the compare key moves with
  *    each beat.
  *  - `deleteIfMatches` — S3 `DeleteObject` with `If-Match: <etag>`,
  *    GCS delete with `ifGenerationMatch=<gen>`, Azure `If-Match`.
  *  - `get` — plain read returning content + last-modified.
  *
  * Implementations must return `false` (not throw) when the
  * precondition fails — that is the signal the lock logic branches
  * on. Transient IO errors may throw; the lease layer treats a
  * throwing acquire poll as contention and re-polls. */
trait ConditionalPutClient {

  /** Atomically create `key` bearing `bytes`; `true` iff THIS call
    * created it (at most one of N racing callers wins). */
  def putIfAbsent(key: String, bytes: Array[Byte]): Boolean

  /** The object's content and last-modified millis, `None` when
    * absent. */
  def get(key: String): Option[(Array[Byte], Long)]

  /** Atomically overwrite `key` with `bytes` iff it currently bears
    * exactly `expect`; `true` iff the write happened. Refreshes
    * last-modified even when `bytes == expect` (the heartbeat). */
  def putIfMatches(key: String, expect: Array[Byte],
      bytes: Array[Byte]): Boolean

  /** Atomically delete `key` iff it currently bears exactly
    * `expect`; `true` iff the delete happened. */
  def deleteIfMatches(key: String, expect: Array[Byte]): Boolean
}

/** Reference [[LockBackend]] for flat-namespace object stores, built
  * entirely on [[ConditionalPutClient]]'s four conditional verbs —
  * no rename, no O_EXCL, no settle windows, so it is safe precisely
  * where [[HadoopLockBackend]] is not. Where the filesystem backend
  * must capture-by-rename before destroying (rename is its only
  * atomic compare-like primitive), here every destructive step IS a
  * server-side compare-and-act.
  *
  * The lock object's CONTENT is `<token>\n<beat serial>`, and every
  * heartbeat rewrites it with the serial bumped. That is the load-
  * bearing detail: the conditional verbs compare content (S3's etag
  * is the content md5, so rewriting the SAME bytes would leave the
  * compare key unchanged), and a breaker deletes conditionally on
  * the content it OBSERVED as stale — a lease whose holder beat even
  * once between the breaker's read and its delete carries a new
  * serial, fails the precondition and survives. Without the serial,
  * a holder waking from a long pause could heartbeat into exactly
  * that window and still lose its live lease.
  *
  *  - acquire: one `putIfAbsent` of a fresh `token\n0` object.
  *  - heartbeat: fenced on the holder's own token line, then
  *    `putIfMatches(cur, token\n(serial+1))` — bumps the compare key
  *    AND last-modified; a zombie holder cannot freshen a re-granted
  *    lease (the fence), and a re-grant racing the beat's read→put
  *    window fails the precondition server-side.
  *  - break: re-read; only while last-modified still equals the
  *    observed-stale value, `deleteIfMatches` on the observed
  *    content.
  *  - release: `deleteIfMatches` on the current content only while
  *    its token line is OURS — a holder paused past the stale window
  *    cannot delete the re-granted lease.
  *
  * Keys are the lock path's fully-qualified URI string. Bind a
  * production client by extending this class with a no-arg
  * constructor that passes an S3/GCS/Azure-backed client, and name
  * it via `graft.lease.backend=<FQCN>`;
  * [[InMemoryObjectStoreLockBackend]] is the shipped template (and
  * the store the contract spec races). */
class ObjectStoreLockBackend(client: ConditionalPutClient)
    extends LockBackend {

  protected def key(fs: FileSystem, lock: HPath): String =
    fs.makeQualified(lock).toUri.toString

  private def body(token: String, serial: Long): Array[Byte] =
    s"$token\n$serial".getBytes(StandardCharsets.UTF_8)

  private def tokenLine(bytes: Array[Byte]): String =
    new String(bytes, StandardCharsets.UTF_8).takeWhile(_ != '\n')

  private def serialLine(bytes: Array[Byte]): Long = {
    val s = new String(bytes, StandardCharsets.UTF_8)
    val i = s.indexOf('\n')
    if (i < 0) 0L
    else scala.util.Try(s.substring(i + 1).trim.toLong).getOrElse(0L)
  }

  override def tryAcquire(fs: FileSystem, lock: HPath): Option[String] = {
    val token = LockBackend.newToken()
    if (client.putIfAbsent(key(fs, lock), body(token, 0L))) Some(token)
    else None
  }

  override def readToken(fs: FileSystem, lock: HPath): Option[String] =
    client.get(key(fs, lock)).map { case (b, _) => tokenLine(b) }

  override def mtime(fs: FileSystem, lock: HPath): Option[Long] =
    client.get(key(fs, lock)).map(_._2)

  override def heartbeat(fs: FileSystem, lock: HPath,
      token: String): Unit =
    client.get(key(fs, lock)).foreach { case (cur, _) =>
      // fenced on the token LINE (a zombie must not freshen a
      // re-granted lease) AND conditioned on the full content (a
      // re-grant between this read and the put fails server-side)
      if (tokenLine(cur) == token)
        client.putIfMatches(key(fs, lock), cur,
          body(token, serialLine(cur) + 1L)); ()
    }

  override def breakStale(fs: FileSystem, lock: HPath, m: Long): Unit =
    client.get(key(fs, lock)).foreach { case (cur, mt) =>
      // the content observed AT the stale mtime is the compare key;
      // any heartbeat or re-grant between this read and the delete
      // changed the serial or the token, fails the precondition, and
      // the live lease survives — the window claim-by-rename narrows
      // on a filesystem is closed server-side here
      if (mt == m) { client.deleteIfMatches(key(fs, lock), cur); () }
    }

  override def release(fs: FileSystem, lock: HPath, token: String): Unit =
    try {
      // the content moves with every heartbeat, so fence on the token
      // LINE and compare-delete on the full observed content; a
      // concurrent beat (possible when release is driven outside
      // withStoreLock, which stops its heartbeat first) just means one
      // retry
      var tries = 0
      var done = false
      while (!done && tries < 5) {
        tries += 1
        client.get(key(fs, lock)) match {
          case None => done = true // already gone: nothing ours to remove
          case Some((cur, _)) if tokenLine(cur) == token =>
            done = client.deleteIfMatches(key(fs, lock), cur)
          case Some(_) =>
            System.err.println(s"[lease] lock $lock no longer bears " +
              "this holder's token at release (lease was broken and " +
              "re-granted while paused) — leaving the new holder's " +
              "lock in place")
            done = true
        }
      }
      if (!done)
        // five reads each saw our token but every conditional delete
        // lost to a concurrent content change — only sustained beats
        // against our own token can do that (a stuck daemon); say so
        // rather than leak silently into the stale window
        System.err.println(s"[lease] release of $lock kept losing " +
          "the conditional delete to concurrent heartbeats — " +
          "leaving it to the stale window / fsck")
    } catch {
      // never throws: release runs in `finally` paths — a failure
      // here is left to the stale window / fsck, like the default
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"[lease] release of $lock failed with " +
          s"$e — leaving it to the stale window / fsck")
    }
}

/** JVM-local [[ConditionalPutClient]] with exactly the atomicity the
  * trait demands — every verb is one `ConcurrentHashMap.compute` on
  * the key, so N racing callers serialize on the store's own
  * arbitration the way S3/GCS conditional requests do server-side.
  * This is the store the lease contract spec races, and doubles as a
  * real single-process backend (a `local[*]` session's streams and
  * maintenance threads genuinely exclude each other through it). */
object InMemoryObjectStore extends ConditionalPutClient {
  private val objects =
    new java.util.concurrent.ConcurrentHashMap[String,
      (Array[Byte], Long)]()

  /** Test hook: drop every object (a fresh bucket per spec). */
  private[graft] def clear(): Unit = objects.clear()

  /** Test hook: rewind an object's last-modified by `ms` — staleness
    * paths (fsck's lease audit, break windows) are time-based and
    * cannot wait out a 30-minute window in a spec. */
  private[graft] def backdate(key: String, ms: Long): Unit = {
    objects.computeIfPresent(key, (_, cur) => (cur._1, cur._2 - ms)); ()
  }

  override def putIfAbsent(key: String, bytes: Array[Byte]): Boolean = {
    var won = false
    objects.compute(key, (_, cur) =>
      if (cur != null) cur
      else { won = true; (bytes.clone(), System.currentTimeMillis()) })
    won
  }

  override def get(key: String): Option[(Array[Byte], Long)] =
    Option(objects.get(key)).map { case (b, m) => (b.clone(), m) }

  override def putIfMatches(key: String, expect: Array[Byte],
      bytes: Array[Byte]): Boolean = {
    var hit = false
    objects.computeIfPresent(key, (_, cur) =>
      if (!java.util.Arrays.equals(cur._1, expect)) cur
      else { hit = true; (bytes.clone(), System.currentTimeMillis()) })
    hit
  }

  override def deleteIfMatches(key: String,
      expect: Array[Byte]): Boolean = {
    var hit = false
    objects.computeIfPresent(key, (_, cur) =>
      if (!java.util.Arrays.equals(cur._1, expect)) cur
      else { hit = true; null })
    hit
  }
}

/** The shipped conditional-put backend: [[ObjectStoreLockBackend]]
  * over the JVM-local [[InMemoryObjectStore]]. No-arg, so it is
  * directly nameable as `graft.lease.backend=` — and the template a
  * production S3/GCS backend copies, swapping only the client. */
class InMemoryObjectStoreLockBackend
    extends ObjectStoreLockBackend(InMemoryObjectStore)
