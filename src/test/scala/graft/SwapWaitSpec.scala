package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.SwapWait

/** The schema gate's swap-wait policy, pinned with an injected clock:
  * each absent-root-with-backup EPISODE gets its own full window —
  * a second episode inside the same read (after footer-read retries
  * interleave a root observation) must not inherit the first
  * episode's spent deadline, or the "whole swap-wait window" claim
  * in the rejection would be false. */
class SwapWaitSpec extends AnyFunSuite {
  test("a single episode waits its window with doubling backoff " +
      "capped at 5 s, then gives up exactly at the deadline") {
    val w = new SwapWait(1000L)
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    assert(w.tick(0L, sleeps += _), "inside the window must wait")
    assert(w.tick(500L, sleeps += _))
    assert(w.tick(999L, sleeps += _))
    assert(!w.tick(1000L, sleeps += _), "the deadline must be firm")
    assert(sleeps.toSeq === Seq(100L, 200L, 400L),
      s"backoff must double from 100 ms: $sleeps")
    val long = new SwapWait(3600000L)
    val caps = scala.collection.mutable.ArrayBuffer.empty[Long]
    (0 until 9).foreach(i => assert(long.tick(i.toLong, caps += _)))
    assert(caps.last === 5000L && caps.count(_ == 5000L) >= 3,
      s"backoff must cap at 5 s: $caps")
  }

  test("reset() ends the episode: the next observation opens a FRESH " +
      "full window from its own clock and the backoff restarts at " +
      "100 ms — a second episode never inherits the first's spent " +
      "deadline") {
    val w = new SwapWait(1000L)
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    // episode 1 runs its window down to the give-up
    assert(w.tick(0L, sleeps += _))
    assert(w.tick(900L, sleeps += _))
    assert(!w.tick(1000L, _ => ()))
    // the root is observed (footer retry interleaving) — episode over
    w.reset()
    sleeps.clear()
    // episode 2 starts at t=1200: WITHOUT the reset the old deadline
    // (1000) is already spent and this first observation would give
    // up immediately; with it the episode waits until 2200
    assert(w.tick(1200L, sleeps += _),
      "a fresh episode must get its own full window, not the prior " +
        "episode's spent deadline")
    assert(sleeps.head === 100L,
      s"a fresh episode must restart the backoff at 100 ms: $sleeps")
    assert(w.tick(2199L, sleeps += _))
    assert(!w.tick(2200L, _ => ()),
      "the fresh window must still be bounded at its own deadline")
  }
}
