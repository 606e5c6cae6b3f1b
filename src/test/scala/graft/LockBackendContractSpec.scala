package graft

import org.apache.hadoop.fs.{FileSystem, Path => HPath}

import graft.streaming.{HadoopLockBackend, InMemoryObjectStore,
  InMemoryObjectStoreLockBackend, LockBackend, Streaming}

/** The reusable at-most-one-grant contract every [[LockBackend]]
  * must honor — the proof a CUSTOM `graft.lease.backend=<FQCN>`
  * implementation extends before standing stores trust it:
  *
  * {{{
  * class MyS3LockBackendSpec extends LockBackendContractSpec {
  *   def backend = new MyS3LockBackend
  *   def freshLock() = (fs, new HPath(s"s3a://bucket/locks/${uuid}"))
  * }
  * }}}
  *
  * Both shipped backends extend it below: the filesystem default
  * (kernel-O_EXCL local) and the conditional-put object-store
  * reference. Every test drives only the [[LockBackend]] trait
  * surface — exactly what [[Streaming.withStoreLock]] calls. */
abstract class LockBackendContractSpec extends SparkSpec {

  /** The backend under test. */
  def backend: LockBackend

  /** A FRESH, absent lock location per call — tests never share one. */
  def freshLock(): (FileSystem, HPath)

  /** Override to `false` if your backend mints its own token scheme —
    * the pid@host/uuid shape is operator telemetry (the waiter log
    * and fsck name the holder through it), not part of the mutual-
    * exclusion contract; every other test here IS the contract. */
  def requiresTelemetryTokens: Boolean = true

  private def name = this.getClass.getSimpleName

  test(s"$name: of 16 racing acquirers on one absent lock, EXACTLY " +
      "one is granted, and the lock bears the winner's token") {
    val (fs, lock) = freshLock()
    val grants = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val start = new java.util.concurrent.CountDownLatch(1)
    val ths = (1 to 16).map { _ =>
      new Thread(() => {
        try {
          start.await()
          backend.tryAcquire(fs, lock).foreach(grants.add)
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    ths.foreach(_.start()); start.countDown(); ths.foreach(_.join(30000L))
    assert(errs.isEmpty, s"acquirer threw on contention: ${errs.peek()}")
    assert(grants.size === 1,
      s"${grants.size} of 16 racing acquirers were granted the lease")
    assert(backend.readToken(fs, lock)
      === Some(grants.peek()), "lock does not bear the winner's token")
  }

  test(s"$name: acquire on a HELD lock returns None without " +
      "throwing; after a fenced release the lock is re-grantable") {
    val (fs, lock) = freshLock()
    val t1 = backend.tryAcquire(fs, lock)
    assert(t1.nonEmpty, "acquire of an absent lock failed")
    assert(backend.tryAcquire(fs, lock).isEmpty,
      "a second acquire was granted while the lease was held")
    backend.release(fs, lock, t1.get)
    assert(backend.readToken(fs, lock).isEmpty,
      "release of the holder's own token left the lock in place")
    assert(backend.tryAcquire(fs, lock).nonEmpty,
      "released lock could not be re-acquired")
  }

  test(s"$name: release is token-fenced — a foreign token leaves the " +
      "lock AND its token intact; releasing an absent lock is a no-op") {
    val (fs, lock) = freshLock()
    val t1 = backend.tryAcquire(fs, lock).get
    backend.release(fs, lock, "not-the-holder-token")
    assert(backend.readToken(fs, lock) === Some(t1),
      "a foreign-token release destroyed or altered the live lease")
    backend.release(fs, lock, t1)
    // never-throws leg: the lock is gone; both calls must be no-ops
    backend.release(fs, lock, t1)
    backend.release(fs, lock, "anything")
    assert(backend.readToken(fs, lock).isEmpty)
  }

  test(s"$name: heartbeat advances the liveness mtime and preserves " +
      "the token — and is token-fenced, so a ZOMBIE's beat cannot " +
      "freshen a re-granted lease") {
    val (fs, lock) = freshLock()
    val t1 = backend.tryAcquire(fs, lock).get
    val m0 = backend.mtime(fs, lock).get
    Thread.sleep(30)
    // a superseded holder's beat (foreign token) must be a no-op —
    // otherwise a zombie's daemon keeps a dead re-granted lease
    // reading live, wedging every waiter into the timeout
    backend.heartbeat(fs, lock, "not-the-holder-token")
    assert(backend.mtime(fs, lock).contains(m0),
      "a foreign-token heartbeat freshened the lease")
    backend.heartbeat(fs, lock, t1)
    assert(backend.mtime(fs, lock).exists(_ > m0),
      "heartbeat did not advance the lock's mtime")
    assert(backend.readToken(fs, lock) === Some(t1),
      "heartbeat altered the lease token")
  }

  test(s"$name: breakStale removes the lock only while its mtime " +
      "still equals the observed-stale value — a refreshed (live) " +
      "lease survives the break attempt") {
    val (fs, lock) = freshLock()
    val t1 = backend.tryAcquire(fs, lock).get
    val m0 = backend.mtime(fs, lock).get
    // the holder is alive: its heartbeat moves the mtime between the
    // waiter's staleness observation and the break
    Thread.sleep(30)
    backend.heartbeat(fs, lock, t1)
    backend.breakStale(fs, lock, m0)
    assert(backend.readToken(fs, lock) === Some(t1),
      "breakStale destroyed a lease whose mtime had moved (live holder)")
    // now genuinely stale: observed mtime is current — break succeeds
    val m1 = backend.mtime(fs, lock).get
    backend.breakStale(fs, lock, m1)
    assert(backend.readToken(fs, lock).isEmpty,
      "breakStale left an observed-stale lock in place")
    assert(backend.tryAcquire(fs, lock).nonEmpty,
      "lock not re-grantable after a break")
  }

  test(s"$name: the granted token names its holder — pid@host/uuid — " +
      "so a waiter's log line and `cat <lock>` identify a long hold " +
      "without fsck") {
    assume(requiresTelemetryTokens,
      "backend opted out of telemetry-shaped tokens")
    val (fs, lock) = freshLock()
    val t1 = backend.tryAcquire(fs, lock).get
    assert(t1.matches("""\d+@[^/]+/[0-9a-f-]{36}"""),
      s"token '$t1' does not carry the pid@host/uuid telemetry shape")
    backend.release(fs, lock, t1)
  }

  test(s"$name: mutual exclusion under churn — 8 threads looping " +
      "acquire→work→release admit exactly one holder at a time") {
    val (fs, lock) = freshLock()
    val inBody = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val ths = (1 to 8).map { _ =>
      new Thread(() => {
        try (1 to 12).foreach { _ =>
          var tok: Option[String] = None
          val deadline = System.currentTimeMillis() + 30000L
          while (tok.isEmpty && System.currentTimeMillis() < deadline) {
            tok = backend.tryAcquire(fs, lock)
            if (tok.isEmpty) Thread.sleep(1)
          }
          assert(tok.nonEmpty, "starved past the deadline")
          val n = inBody.incrementAndGet()
          maxSeen.getAndUpdate(m => math.max(m, n))
          inBody.decrementAndGet()
          backend.release(fs, lock, tok.get)
        } catch { case t: Throwable => errs.add(t) }
      })
    }
    ths.foreach(_.start()); ths.foreach(_.join(60000L))
    assert(errs.isEmpty, s"churn participant failed: ${errs.peek()}")
    assert(maxSeen.get() === 1,
      s"${maxSeen.get()} holders were inside the lease at once")
  }
}

/** A backend whose heartbeat throws a RuntimeException on its first
  * invocation (the shape of a cloud SDK's transient error) and
  * delegates afterwards — proves the lease daemon survives a
  * non-IOException beat. */
class FlakyHeartbeatBackend extends graft.streaming.LockBackend {
  override def tryAcquire(fs: FileSystem, lock: HPath): Option[String] =
    graft.streaming.HadoopLockBackend.tryAcquire(fs, lock)
  override def heartbeat(fs: FileSystem, lock: HPath,
      token: String): Unit = {
    if (FlakyHeartbeatBackend.beats.getAndIncrement() == 0)
      throw new RuntimeException("transient SDK error")
    super.heartbeat(fs, lock, token)
  }
}
object FlakyHeartbeatBackend {
  val beats = new java.util.concurrent.atomic.AtomicInteger(0)
}

/** The filesystem default passes its own contract (local leg:
  * kernel-arbitrated O_EXCL create). */
class HadoopLockBackendContractSpec extends LockBackendContractSpec {
  def backend: LockBackend = HadoopLockBackend
  def freshLock(): (FileSystem, HPath) = {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-lockcontract").toString
    val p = new HPath(s"$tmp/.store.lock")
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }
}

/** The conditional-put object-store reference passes the same
  * contract — every destructive verb is a server-side
  * compare-and-act, no rename or O_EXCL involved. */
class InMemoryObjectStoreLockBackendContractSpec
    extends LockBackendContractSpec {
  def backend: LockBackend = new InMemoryObjectStoreLockBackend
  def freshLock(): (FileSystem, HPath) = {
    // the path is only a KEY here (its URI string); nothing is ever
    // created on the filesystem — asserted below
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-oslockcontract").toString
    val p = new HPath(s"$tmp/.store.lock")
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  test("object-store backend: every heartbeat CHANGES the lock " +
      "object's content, so a breaker's conditional delete keyed on " +
      "pre-beat content fails — the observe→delete window is closed " +
      "server-side, not narrowed") {
    val (fs, lock) = freshLock()
    val t1 = backend.tryAcquire(fs, lock).get
    val key = fs.makeQualified(lock).toUri.toString
    val observed = InMemoryObjectStore.get(key).get._1
    // the holder beats once between the breaker's observation and its
    // delete — exactly the window a same-bytes heartbeat (or a
    // filesystem backend without capture-by-rename) would lose
    backend.heartbeat(fs, lock, t1)
    assert(!InMemoryObjectStore.deleteIfMatches(key, observed),
      "a delete conditioned on pre-heartbeat content succeeded — the " +
        "beat did not move the compare key")
    assert(backend.readToken(fs, lock) === Some(t1),
      "live lease lost to a stale-content break")
    backend.release(fs, lock, t1)
    assert(InMemoryObjectStore.get(key).isEmpty,
      "fenced release failed after heartbeats moved the content")
  }

  test("the lease heartbeat daemon survives a backend whose beat " +
      "throws a RuntimeException — a LIVE holder keeps beating and a " +
      "waiter never breaks it mid-body") {
    val conf = spark.sparkContext.hadoopConfiguration
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-flakybeat").toString
    val root = s"$tmp/store"
    FlakyHeartbeatBackend.beats.set(0)
    conf.set("graft.lease.backend",
      classOf[FlakyHeartbeatBackend].getName)
    try {
      val overlapped =
        new java.util.concurrent.atomic.AtomicBoolean(false)
      val inside = new java.util.concurrent.atomic.AtomicInteger(0)
      val errs =
        new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      // staleAfterMs = 200 → heartbeat every 50 ms; the FIRST beat
      // throws (pre-fix, that killed the daemon and the holder read
      // stale after 200 ms); the hold spans 5 windows
      val holder = new Thread(() => {
        try Streaming.withStoreLock(spark, Seq(root),
          timeoutMs = 10000L, staleAfterMs = 200L) {
          inside.incrementAndGet()
          Thread.sleep(1000)
          if (inside.decrementAndGet() != 0) overlapped.set(true)
          ()
        } catch { case t: Throwable => errs.add(t) }
      })
      holder.start()
      Thread.sleep(100) // let the holder acquire
      val waiter = new Thread(() => {
        try Streaming.withStoreLock(spark, Seq(root),
          timeoutMs = 10000L, staleAfterMs = 200L) {
          if (inside.get() != 0) overlapped.set(true)
          ()
        } catch { case t: Throwable => errs.add(t) }
      })
      waiter.start()
      holder.join(); waiter.join()
      assert(errs.isEmpty, s"lease participant failed: ${errs.peek()}")
      assert(FlakyHeartbeatBackend.beats.get() > 1,
        "daemon died after the throwing beat — the fix under test")
      assert(!overlapped.get(),
        "a throwing beat killed the daemon and a waiter broke the " +
          "LIVE holder's lease")
    } finally conf.unset("graft.lease.backend")
  }

  test("object-store backend: fsck's lease audit reads the OBJECT " +
      "store — a stale conditional-put lease is flagged naming its " +
      "holder, not silently skipped because no lock FILE exists") {
    import org.apache.spark.sql.functions.col
    val conf = spark.sparkContext.hadoopConfiguration
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-oslock-fsck").toString
    val store = s"$tmp/store"
    new java.io.File(store).mkdirs()
    conf.set("graft.lease.backend",
      classOf[InMemoryObjectStoreLockBackend].getName)
    try {
      val fs = new HPath(store)
        .getFileSystem(conf)
      val lock = new HPath(s"$tmp/.store.lock")
      val be = new InMemoryObjectStoreLockBackend
      val tok = be.tryAcquire(fs, lock).get
      // a FRESH lease is a live holder, not a finding
      assert(Streaming.fsckStore(spark, store)
        .where(col("area") === "lease").isEmpty)
      val key = fs.makeQualified(lock).toUri.toString
      InMemoryObjectStore.backdate(key,
        Streaming.DefaultLeaseStaleMs + 60000L)
      val f = Streaming.fsckStore(spark, store)
        .where(col("area") === "lease").collect()
      assert(f.length === 1 && f(0).getString(2) === "warn",
        s"stale object-store lease not flagged: ${f.toSeq}")
      assert(f(0).getString(3).contains(tok),
        s"finding must name the dead holder's token: ${f(0)}")
      be.release(fs, lock, tok)
    } finally conf.unset("graft.lease.backend")
  }

  test("object-store backend: the lease lives in the object store, " +
      "not on the filesystem, and withStoreLock drives it end-to-end " +
      "with mutual exclusion") {
    val conf = spark.sparkContext.hadoopConfiguration
    val tmp = java.nio.file.Files
      .createTempDirectory("graft-oslock-e2e").toString
    val root = s"$tmp/store"
    conf.set("graft.lease.backend",
      classOf[InMemoryObjectStoreLockBackend].getName)
    try {
      val inBody = new java.util.concurrent.atomic.AtomicInteger(0)
      val maxSeen = new java.util.concurrent.atomic.AtomicInteger(0)
      val errs =
        new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
      val ths = (1 to 6).map { _ =>
        new Thread(() => {
          try Streaming.withStoreLock(spark, Seq(root),
            timeoutMs = 30000L) {
            val n = inBody.incrementAndGet()
            maxSeen.getAndUpdate(m => math.max(m, n))
            // the lock path must NOT exist as a file: the lease is an
            // object-store key, which is the whole point
            assert(!new java.io.File(s"$tmp/.store.lock").exists(),
              "object-store lease leaked onto the filesystem")
            Thread.sleep(5)
            inBody.decrementAndGet()
            ()
          } catch { case t: Throwable => errs.add(t) }
        })
      }
      ths.foreach(_.start()); ths.foreach(_.join(60000L))
      assert(errs.isEmpty, s"participant failed: ${errs.peek()}")
      assert(maxSeen.get() === 1,
        s"${maxSeen.get()} holders were inside the lease at once")
      // all released: the store holds no leftover lease object
      val key = new HPath(s"$tmp/.store.lock")
        .getFileSystem(conf).makeQualified(
          new HPath(s"$tmp/.store.lock")).toUri.toString
      assert(InMemoryObjectStore.get(key).isEmpty,
        "lease object not removed after the last release")
    } finally conf.unset("graft.lease.backend")
  }
}
